#!/usr/bin/env python3
"""Verify every /root/reference/... citation in src/ scaladoc points at a
file that exists, with any cited line range inside the file's length.

Round-10 VERDICT item 7: ns/Html.scala cited a nonexistent
include/utils/gcs.py. This check makes citation drift mechanical to
catch: run it from the repo root; exit 1 on any dangling cite.

Citations may wrap across scaladoc lines (" * " continuation); the
matcher therefore first strips comment-continuation markers and joins
wrapped lines before extracting paths.
"""
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "src")
CITE = re.compile(r"/root/reference/([A-Za-z0-9_./-]+?)(?:[:](\d+)(?:-(\d+))?)?(?=[^A-Za-z0-9_./-]|$)")

def scala_files():
    for dirpath, _, names in os.walk(SRC):
        for n in names:
            if n.endswith(".scala"):
                yield os.path.join(dirpath, n)

bad = []
checked = 0
for path in scala_files():
    with open(path, encoding="utf-8") as f:
        raw = f.read()
    # Join scaladoc line wraps: "...include/\n  * utils/foo.py" must
    # resolve as one path, not a dangling prefix.
    joined = re.sub(r"\n\s*\*\s?", "", raw)
    joined = re.sub(r"\n\s*//\s?", "", joined)
    for m in CITE.finditer(joined):
        rel, lo, hi = m.group(1), m.group(2), m.group(3)
        rel = rel.rstrip(".,;")
        target = os.path.join("/root/reference", rel)
        checked += 1
        if not os.path.isfile(target):
            bad.append(f"{path}: cites nonexistent {target}")
            continue
        if lo is not None:
            with open(target, encoding="utf-8", errors="replace") as tf:
                nlines = sum(1 for _ in tf)
            last = int(hi) if hi else int(lo)
            if int(lo) < 1 or last > nlines:
                bad.append(f"{path}: cites {target}:{lo}"
                           f"{'-' + hi if hi else ''} but file has {nlines} lines")

print(f"checked {checked} reference citations")
for b in bad:
    print("DANGLING:", b)
sys.exit(1 if bad else 0)
