#!/usr/bin/env python3
"""Slice per-query sections out of a PLANS.md-format file into
plans/<round>/<query>_<tag>.txt files. Driver-side tooling for the
optimization rounds' before/after plan artifacts.
Usage: slice_plans.py <plans_md> <out_dir> <tag> <q1,q2,...>
"""
import sys
import re
import pathlib

plans_md, out_dir, tag, qlist = sys.argv[1:5]
queries = qlist.split(",")
text = open(plans_md).read()
out = pathlib.Path(out_dir)
out.mkdir(parents=True, exist_ok=True)
sections = re.split(r"^## ", text, flags=re.M)
by_name = {}
for sec in sections[1:]:
    name = sec.split("\n", 1)[0].strip()
    by_name[name] = "## " + sec
missing = [q for q in queries if q not in by_name]
for q in queries:
    if q in by_name:
        (out / f"{q}_{tag}.txt").write_text(by_name[q])
print(f"wrote {len(queries) - len(missing)} sections, missing: {missing}")
