#!/usr/bin/env python3
"""Differential-test golden generator (test tooling only, not product code).

Executes the reference's variant-caller functions (/root/reference/MSA_Reader.py,
with the Biopython imports stubbed out) on randomly generated alignments and
dumps the emitted raw-variant lines to src/test/resources/variant_golden.tsv.
A ScalaTest (VariantCallerGoldenSpec) replays the same alignments through the
Scala port in legacy-truthiness mode and asserts byte-identical events.
"""
import random, io, os, tempfile, contextlib

SRC = open("/root/reference/MSA_Reader.py").read()
# Strip the Biopython / environment preamble (first ~14 lines of imports);
# keep everything from the first def onwards plus numpy/pandas-free logic.
body = SRC[SRC.index("def initalize_file") : SRC.index('"""\nPart 2')]
ns = {}
exec(body, ns)

class Row:
    def __init__(self, id_, s):
        self.id = id_
        self.seq = s

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

random.seed(20260812)
ALPHA = "ACDEFGHIKLMNPQRSTVWY"
cases = []
for case in range(1500):
    n = random.randint(3, 60)
    # aligned reference: mostly letters, some gaps, never all-gap
    while True:
        ref = "".join(random.choice(ALPHA) if random.random() > 0.18 else "-" for _ in range(n))
        if any(c != "-" for c in ref):
            break
    rows = [Row("Ref;size=1;", ref)]
    for r in range(4):
        seq = []
        for i in range(n):
            p = random.random()
            if p < 0.68:
                seq.append(ref[i])
            elif p < 0.82:
                seq.append("-")
            else:
                seq.append(random.choice(ALPHA))
        rows.append(Row(f"Uniq{case}_{r};size={random.randint(1, 99)};", "".join(seq)))
    cases.append((ref, rows))

# ---- adversarial families: shapes the uniform fuzz rarely produces, and
# where the caller's resume-index logic is most at risk (all-gap columns,
# N/C-terminal indel stacks, length-1 alignments, fully-deleted rows,
# long interior runs driving the del/ins/delins switchover).
def adversarial_cases():
    out = []
    case_id = 10000
    def mk(ref, variants):
        nonlocal case_id
        rows = [Row("Ref;size=1;", ref)]
        for i, v in enumerate(variants):
            assert len(v) == len(ref), (ref, v)
            rows.append(Row(f"Adv{case_id}_{i};size={random.randint(1, 99)};", v))
        out.append((ref, rows))
        case_id += 1
    # length-1 alignments: every (ref, var) combination over letter/gap
    for rc in ["A", "-"]:
        if rc == "-":
            continue  # all-gap ref is rejected upstream; nothing to call
        for vc in ["A", "C", "-"]:
            mk(rc, [vc])
    # all-gap COLUMNS shared by ref and variant (alignment padding)
    mk("A--CDE--F", ["A--CDE--F", "G--CDE--F", "A--C-E--F", "A--CDEK-F"])
    mk("--ACD--EF--", ["--ACD--EF--", "--A-D--EF--", "--ACDK-EF--"])
    # N-terminal indel stacks: leading deletion runs, leading insertions
    # (letters where the ref has gaps), and both stacked
    mk("MFVKLMNP", ["---KLMNP", "----LMNP", "-------P", "AFVKLMNP"])
    mk("---KLMNP", ["AAQKLMNP", "A--KLMNP", "AA-KLMNP", "---KLMNP"])
    mk("--MFVKLP", ["AA-FVKLP", "A---VKLP", "AAMFVKLP"])
    # C-terminal stacks: trailing deletions, trailing extensions
    mk("MFVKLMNP", ["MFVKL---", "MFVKLMN-", "M-------"])
    mk("MFVKL---", ["MFVKLAAQ", "MFVKLA--", "MFVKL--A", "MFVK-AAQ"])
    # whole-row deletion (every ref position gapped in the variant)
    mk("ACDEF", ["-----", "A----", "----F"])
    # long interior runs: del->ins switchover (delins) and back-to-back
    # opposite runs with single-column flanks
    mk("MAAAAAAAAAP", ["M---------P", "MCCCCCCCCCP", "M----CCCCCP", "MC----CCCCP"])
    mk("MA---AAAAP", ["MACCCAAAAP", "M----AAAAP", "MACC-AAAAP", "MA---AA--P"])
    # interleaved all-gap columns inside an indel run (gap-run bridging)
    mk("MA--AA--AP", ["M---------", "M--------P", "MG--AA--GP", "M---AA---P"])
    return out

cases.extend(adversarial_cases())

out_dir = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources")
os.makedirs(out_dir, exist_ok=True)
aln_lines = []
tsv_lines = []
skipped = 0
for ref, rows in cases:
    with tempfile.NamedTemporaryFile("w+", suffix=".tsv", delete=False) as f:
        raw = f.name
    ref_index = ns["reference_position"](ref)
    try:
        with contextlib.redirect_stdout(io.StringIO()):
            ns["msa_iterator"](Aln(rows), raw, ref, ref_index, raw)
    except UnboundLocalError:
        # The REFERENCE crashes on inputs where an insertion has a
        # truthiness-falsy N flank at index 0 and no C flank
        # (record_insertion_info's print_type is never assigned,
        # MSA_Reader.py:526-580). No golden can exist for these; the Scala
        # port handles them (VariantCallerSpec covers the index-0 flank).
        skipped += 1
        os.unlink(raw)
        continue
    with open(raw) as f:
        ev = f.read().rstrip("\n")
    os.unlink(raw)
    for row in rows:
        aln_lines.append(f"{row.id}\t{row.seq}\t{ref}")
    if ev:
        tsv_lines.extend(ev.split("\n"))
print(f"skipped {skipped} reference-crashing cases of {len(cases)}")

with open(os.path.join(out_dir, "variant_golden_alignments.tsv"), "w") as f:
    f.write("\n".join(aln_lines) + "\n")
with open(os.path.join(out_dir, "variant_golden_events.tsv"), "w") as f:
    f.write("\n".join(tsv_lines) + "\n")
print(f"cases={len(cases)} rows={len(aln_lines)} events={len(tsv_lines)}")
