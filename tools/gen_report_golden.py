#!/usr/bin/env python3
"""Report-block differential goldens (test tooling only, not product code).

Runs the REFERENCE's own report functions (/root/reference/MSA_Reader.py:
mutation_csv at :968, mutation_count_table at :1107 incl. break_up_del)
on a synthetic MSA, in main()'s call order (:1234, :1243 — csv BEFORE the
count table, because break_up_del mutates the database), and stores:
  src/test/resources/report_golden_alignment.tsv  (id<TAB>seq rows; first is ref)
  src/test/resources/report_golden_all_by_code.csv
  src/test/resources/report_golden_variant_counts.csv
ReportGoldenSpec replays the alignment through the Scala engine and
compares both CSVs value-for-value.
"""
import io, os, random, contextlib, tempfile

SRC = open("/root/reference/MSA_Reader.py").read()
ns = {}
# caller block (variant detection)
exec(SRC[SRC.index("def initalize_file"): SRC.index('"""\nPart 2')], ns)
# VariantRecord + database loader (before the natsort import at :782)
exec(SRC[SRC.index("class VariantRecord"): SRC.index("from natsort import")], ns)
# report functions: mutation_csv .. end of mutation_count_table
exec(SRC[SRC.index("def mutation_csv"): SRC.index("def main(")], ns)


class Row:
    def __init__(self, id_, s):
        self.id = id_
        self.seq = s
    def __len__(self):
        return len(self.seq)
    def __getitem__(self, i):
        return self.seq[i]


class Slice:
    def __init__(self, s):
        self.seq = s


class Aln:
    def __init__(self, rows):
        self.rows = rows
    def __len__(self):
        return len(self.rows)
    def __getitem__(self, key):
        if isinstance(key, tuple):
            j, i = key
            if isinstance(i, slice):
                return Slice(self.rows[j].seq[i])
            return self.rows[j].seq[i]
        return self.rows[key]


random.seed(4242)
ALPHA = "ACDEFGHIKLMNPQRSTVWY"
n = 140
while True:
    ref = "".join(random.choice(ALPHA) if random.random() > 0.12 else "-"
                  for _ in range(n))
    if ref[0] != "-" and ref[-1] != "-" and any(c != "-" for c in ref):
        break
rows = [Row("Ref;size=2;", ref)]
for r in range(50):
    seq = []
    for i in range(n):
        p = random.random()
        if p < 0.72:
            seq.append(ref[i])
        elif p < 0.85:
            seq.append("-")
        else:
            seq.append(random.choice(ALPHA))
    rows.append(Row(f"Uniq{r};size={random.randint(1, 40)};", "".join(seq)))
aln = Aln(rows)

ref_index = ns["reference_position"](ref)
raw = tempfile.mktemp()
ns["initalize_file"](raw)  # writes header to raw + "_variants_raw.tsv"
with contextlib.redirect_stdout(io.StringIO()):
    ns["msa_iterator"](aln, raw + "_variants_raw.tsv", rows[0], ref_index,
                       raw + "_variants_raw.tsv")
var_db = ns["initialize_mutation_database"](raw)

all_report = tempfile.mktemp()
count_report = tempfile.mktemp()
open(all_report, "w").write("")
open(count_report, "w").write("")
with contextlib.redirect_stdout(io.StringIO()):
    # main()'s order: csv first (:1234), count table second (:1243)
    ns["mutation_csv"](var_db, all_report, aln)
    ns["mutation_count_table"](aln, var_db, rows[0], ref_index, count_report)

out_dir = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources")
with open(os.path.join(out_dir, "report_golden_alignment.tsv"), "w") as f:
    for row in rows:
        f.write(f"{row.id}\t{row.seq}\n")
for src, name in [(all_report, "report_golden_all_by_code.csv"),
                  (count_report, "report_golden_variant_counts.csv")]:
    with open(src) as s, open(os.path.join(out_dir, name), "w") as d:
        d.write(s.read())
print("rows:", len(rows), "events:",
      sum(1 for _ in open(raw + "_variants_raw.tsv")) - 1)
