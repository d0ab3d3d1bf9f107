#!/usr/bin/env python3
"""Split PlanDump stdout (===== qname ===== sections) into per-query files.

Handles sbt's "[info] " line prefix. Usage:
  split_plans.py <dumpfile> <outdir> <suffix>
Writes <outdir>/<qname>_<suffix>.txt for each section.
"""
import sys, re, os

dump, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
os.makedirs(outdir, exist_ok=True)
cur, buf = None, []

def flush():
    if cur and buf:
        with open(os.path.join(outdir, f"{cur}_{suffix}.txt"), "w") as f:
            f.write("".join(buf).strip() + "\n")

for line in open(dump, errors="replace"):
    if line.startswith("[info] "):
        line = line[len("[info] "):]
    elif line.startswith("[error]") or line.startswith("[success]"):
        continue
    m = re.match(r"^===== (\S+) =====", line)
    if m:
        flush()
        cur, buf = m.group(1), []
    elif cur is not None:
        buf.append(line)
flush()
print("split", dump, "->", outdir, f"(*_{suffix}.txt)")
