package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints over a table, verified in ONE
  * aggregation pass — the ingestion-gate primitive (the Deequ shape) a
  * lake pipeline runs before promoting a snapshot.
  *
  * The reference trusts its inputs (`/root/reference/Sequence_Filter.py`
  * validates per-row and silently drops); at 100 TB you want the
  * violation COUNTS first — promote/quarantine is a policy decision on
  * the report, and re-scanning the table once per constraint is the
  * anti-pattern. Every row-level constraint here compiles to a
  * conditional-sum expression inside a single `agg(...)`, so checking
  * ten constraints costs the same one scan as checking one; uniqueness
  * rides the same pass as `count - count_distinct` (exact, not a
  * sketch — a promotion gate should not approximate).
  *
  * Output is long-form: `(seq, rule, violations, total, passed)` — one
  * row per constraint, stable order, engine-portable arithmetic
  * (counts only), so the whole report is DuckDB-oracle-able.
  */
object Quality {

  sealed trait Constraint {
    /** Stable report key. */
    def label: String
    /** Violation counter: a column summing to the violation count. */
    private[Quality] def violations: Column
  }

  /** Column must be non-null. */
  final case class NotNull(colName: String) extends Constraint {
    val label = s"not_null($colName)"
    private[Quality] def violations =
      sum(when(col(colName).isNull, 1L).otherwise(0L))
  }

  /** Column must fall in `[lo, hi]` (nulls are NOT violations here —
    * compose with [[NotNull]] to forbid them; one concern per row). */
  final case class InRange(colName: String, lo: Double, hi: Double)
      extends Constraint {
    val label = s"in_range($colName,$lo,$hi)"
    private[Quality] def violations =
      sum(when(col(colName).isNotNull &&
        !col(colName).between(lo, hi), 1L).otherwise(0L))
  }

  /** Column values must come from the allowed set (nulls exempt). */
  final case class InSet(colName: String, allowed: Seq[String])
      extends Constraint {
    val label = s"in_set($colName)"
    private[Quality] def violations =
      sum(when(col(colName).isNotNull &&
        !col(colName).isin(allowed: _*), 1L).otherwise(0L))
  }

  /** String column must match the (Java/RE2-common subset) regex. */
  final case class Matches(colName: String, regex: String) extends Constraint {
    val label = s"matches($colName)"
    private[Quality] def violations =
      sum(when(col(colName).isNotNull &&
        !col(colName).rlike(regex), 1L).otherwise(0L))
  }

  /** The column tuple must be unique across the table. Violations =
    * rows beyond the first per duplicated tuple, over rows whose key is
    * FULLY non-null — null keys are exempt (SQL `COUNT(DISTINCT …)`
    * skips them; compose with [[NotNull]] to forbid them). A
    * struct-based count would silently count the all-null group as one
    * distinct value and diverge from every SQL engine's semantics. */
  final case class Unique(cols: Seq[String]) extends Constraint {
    val label = s"unique(${cols.mkString(",")})"
    private[Quality] def violations = {
      val nonNull = cols.map(col(_).isNotNull).reduce(_ && _)
      (sum(when(nonNull, 1L).otherwise(0L)) -
        count_distinct(col(cols.head), cols.tail.map(col): _*)).cast("long")
    }
  }

  /** One-pass constraint report. Row order follows the constraint list
    * (a `seq` ordinal is carried so the order is deterministic under
    * any engine's sort). */
  def report(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "no constraints to check")
    val aggs = count(lit(1)).as("graft_total") +:
      constraints.zipWithIndex.map { case (c, i) =>
        c.violations.as(s"graft_v$i") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // long form: array-of-structs + explode (binds Column expressions
    // directly — `stack` would need SQL-text splicing)
    val entries = array(constraints.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("seq"), lit(c.label).as("rule"),
        coalesce(col(s"graft_v$i"), lit(0L)).as("violations"))
    }: _*)
    one.select(col("graft_total"), explode(entries).as("e"))
      .select(col("e.seq").as("seq"), col("e.rule").as("rule"),
        col("e.violations").as("violations"),
        col("graft_total").as("total"),
        (col("e.violations") === 0L).as("passed"))
      .orderBy("seq")
  }

  /** Hard gate: throws if any constraint fails, returns `df` untouched
    * otherwise — the promote-or-abort form. */
  def enforce(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    val failed = report(df, constraints).filter(!col("passed"))
      .select("rule", "violations").collect()
    if (failed.nonEmpty)
      sys.error("quality gate failed: " + failed.map(r =>
        s"${r.getString(0)} (${r.getLong(1)} violations)").mkString("; "))
    df
  }

  /** Benford's-law expected first-digit probabilities log₁₀(1 + 1/d),
    * d = 1..9, as FIXED double literals (computed once here, embedded
    * identically in the SQL mirror) — so no engine's log implementation
    * ever runs inside the registered query. */
  val BenfordP: Seq[Double] = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** Benford first-digit conformance per group — the classic
    * fabricated-or-degenerate-numbers screen (Benford 1938; auditing
    * standard since Nigrini): natural multi-magnitude quantities put
    * ~30.1% of first digits at 1, a uniform or synthetic column does
    * not, so a high χ² flags generated/defaulted/truncated data the
    * null-and-range checks above cannot see.
    *
    * Exactness discipline: the first digit comes from the DECIMAL/INT
    * string prefix of floor(x) — no log10 bucketing, no float anywhere
    * until the final χ² fold; digit counts are exact BIGINTs, expected
    * probabilities are the [[BenfordP]] literals, and
    * χ² = Σ_d (n_d − n·p_d)²/(n·p_d) folds in fixed digit order — so
    * the statistic hashes cross-engine. Rows with null or < 1 values
    * are dropped (Benford is about positive magnitudes ≥ 1; fractional
    * leading zeros have no first digit in this convention).
    *
    * One aggregation pass; output: groups... + (n, d1..d9, chi2). */
  def benford(df: DataFrame, groupCols: Seq[Column], x: Column): DataFrame = {
    // via BIGINT so the string form is bare digits on every engine
    // (a DECIMAL's VARCHAR cast may carry trailing ".000")
    val digit = substring(floor(x).cast("bigint").cast("string"), 1, 1)
    val aggs = count(lit(1)).as("n") +:
      (1 to 9).map(d =>
        sum(when(digit === lit(d.toString), 1L).otherwise(0L))
          .as(s"d$d"))
    val counted = df.filter(x.isNotNull && x >= 1)
      .groupBy(groupCols: _*)
      .agg(aggs.head, aggs.tail: _*)
    // the 9 terms fold through an explicit HOF, NOT a bare `+` chain:
    // Catalyst rebalances long associative chains for codegen depth,
    // which silently reassociates the float sum (measured: the 9-term
    // chain came back as a balanced tree, one ulp off the oracle's
    // left fold) — a lambda is opaque to that rewrite, and the
    // 0.0-seeded left fold equals list_reduce's first-element seed
    // exactly (0.0 + t₁ = t₁ in IEEE)
    val terms = (1 to 9).map { d =>
      val e = col("n").cast("double") * lit(BenfordP(d - 1))
      ((col(s"d$d").cast("double") - e) *
        (col(s"d$d").cast("double") - e)) / e
    }
    val chi2 = aggregate(array(terms: _*), lit(0.0), (a, x) => a + x)
    counted.withColumn("chi2", when(col("n") > 0, chi2))
  }
}
