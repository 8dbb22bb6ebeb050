#!/usr/bin/env python3
"""Stage a ZERO-ROW corpus with schemas copied bit-exactly from a real
scale-factor dir (r16 verdict #2: the bug class that recurred twice —
matryoshka r14, k_generalize r15 — is row-count divergence from the DuckDB
oracle on empty/degenerate input, and the all-empty EmptyCorpusSpec test
only asserts "runs without throwing"). The staged corpus feeds the SAME
Verify + check_oracle flow the driver runs, so every registered query gets
a full oracle compare on empty input:

    python3 tools/make_empty_corpus.py /root/testdata/sf0.001 target/empty_corpus
    sbt -batch "runMain graft.Verify $PWD/target/empty_corpus $PWD/target/verify_empty"
    python3 tools/check_oracle.py target/empty_corpus target/verify_empty

Dev-side tooling only (pyarrow, like check_oracle's duckdb) — never a
library dependency.
"""
import sys, os, glob
import pyarrow.parquet as pq

src, dst = sys.argv[1], sys.argv[2]
os.makedirs(dst, exist_ok=True)
for p in sorted(glob.glob(f"{src}/*.parquet")):
    name = os.path.basename(p)
    schema = pq.read_schema(p)
    empty = pq.read_table(p).slice(0, 0)
    pq.write_table(empty, os.path.join(dst, name))
    print(f"{name:24s} {schema.names}")
