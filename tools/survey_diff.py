#!/usr/bin/env python3
"""Diff the SURVEY.md §2 operator inventory against the code registry.

The registry is ground truth: every `Op("key", ...)` in
src/main/scala/thrivespark. SURVEY.md must document every key —
numbered §2 rows carry the key in the SECOND cell (`| N | `key` | ...`),
§2.12 rows in the first (`| `key` | ...`). sink_jdbc (§2 #5) is a
Sink-trait row by its own spec, not a queries() entry, so it is allowed
to appear in SURVEY without a registry entry.

Exit 0 with empty diffs = the inventory is self-consistent.
"""
import re
import subprocess
import sys

ROOT = subprocess.run(["git", "rev-parse", "--show-toplevel"],
                      capture_output=True, text=True).stdout.strip() or "."

registry = set()
src = subprocess.run(
    ["grep", "-rhoE", r'Op\("[a-z0-9_]+"', f"{ROOT}/src/main/scala/thrivespark"],
    capture_output=True, text=True).stdout
for m in re.finditer(r'Op\("([a-z0-9_]+)"', src):
    registry.add(m.group(1))

survey = set()
table_rows = 0
in_s2 = False
in_212 = False
for line in open(f"{ROOT}/SURVEY.md", encoding="utf-8"):
    # r21 (ADVICE): anchor on the digit boundary — the old [^.0-9] tail
    # failed on a heading ending right after the digit ('## 2\n') and the
    # '## 2.' special case; \b covers both without matching '## 21'
    if re.match(r"^##\s*(§\s*)?2(\b|\.)", line):
        in_s2 = True
    elif re.match(r"##\s", line):
        in_s2 = False
    if line.startswith("### 2.12"):
        in_212 = True
    elif line.startswith("### ") or line.startswith("## "):
        in_212 = False
    if not in_s2:
        continue
    m = re.match(r"\|\s*\d+\s*\|\s*`([a-z0-9_]+)`", line)
    if m:
        survey.add(m.group(1))
        continue
    m = re.match(r"\|\s*`([a-z0-9_]+)`", line)
    if m:
        survey.add(m.group(1))
        if in_212:
            table_rows += 1

missing_from_survey = sorted(registry - survey)
not_in_registry = sorted(survey - registry - {"sink_jdbc"})

print(f"registry keys: {len(registry)}")
print(f"survey table keys: {len(survey)} (2.12 rows: {table_rows})")
print(f"in registry, missing from SURVEY tables: {missing_from_survey}")
print(f"in SURVEY tables, not in registry (sink_jdbc excused): {not_in_registry}")
sys.exit(0 if not missing_from_survey and not not_in_registry else 1)
