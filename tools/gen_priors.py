#!/usr/bin/env python3
"""Regenerate src/main/scala/graft/BenchPriors.scala from a bench log.

Usage: python3 tools/gen_priors.py <bench_log_file>

Reads the {"metric":"total_detail",...} line (the full per-query map) and
rewrites the BenchPriors.prior map. Run the bench SOLO on a quiet box first;
the priors' job is contamination localization, not grading.
"""
import json
import sys
import pathlib

log = pathlib.Path(sys.argv[1]).read_text()
detail = None
for line in log.splitlines():
    line = line.strip()
    if line.startswith('{') and '"total_detail"' in line:
        detail = json.loads(line)
if detail is None:
    sys.exit("no total_detail line found in log")

queries = detail["queries"]
entries = ",\n".join(
    f'    "{k}" -> {v:.3f}' for k, v in sorted(queries.items()))

target = pathlib.Path(__file__).resolve().parent.parent / \
    "src/main/scala/graft/BenchPriors.scala"
text = target.read_text()
head, _, _ = text.partition("  val prior: Map[String, Double] = ")
new = (head + "  val prior: Map[String, Double] = Map(\n" +
       entries + ")\n}\n")
target.write_text(new)
print(f"wrote {len(queries)} priors to {target}")
