#!/usr/bin/env python3
"""Check SURVEY.md §2.9 completeness against the SparkEntry registry.

§2.9's own contract is "maintained every round": every query id
registered in SparkEntry.queries must be mentioned in some §2.9
implementation-map row (round-11 verdict item 2 — the blueprint had
gone stale for ~18 queries). Dev-side only, like check_citations.py.

Usage: python3 tools/check_survey.py   (exit 1 on any missing id)
"""
import re
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def registry_ids():
    src = open(os.path.join(
        ROOT, "src/main/scala/graft/SparkEntry.scala")).read()
    # registry entries look like:  "ns134_crawl_frontier" -> ((s, d) =>
    names = re.findall(r'"((?:q|o|j|dq|ns|s|p)\d+[a-z]?(?:_[a-z0-9_]+)?)"\s*->',
                       src)
    return sorted({n.split("_")[0] for n in names})


def survey_section():
    text = open(os.path.join(ROOT, "SURVEY.md")).read()
    start = text.index("### 2.9")
    end = text.index("## 3.", start)
    return text[start:end]


def main():
    sec = survey_section()
    # ids mentioned anywhere in §2.9 (table rows or prose)
    mentioned = set(re.findall(r"\b((?:q|o|j|dq|ns|s|p)\d+b?)\b", sec))
    # expand range notation like "q01–q11" (en dash or hyphen)
    for pre, a, b in re.findall(
            r"\b(q|o|j|dq|ns|s|p)(\d+)[–-]\1?(\d+)\b", sec):
        for k in range(int(a), int(b) + 1):
            mentioned.add(f"{pre}{k:0{len(a)}d}")
    missing = [i for i in registry_ids() if i not in mentioned]
    if missing:
        print("MISSING from SURVEY.md §2.9: " + ", ".join(missing))
        sys.exit(1)
    print(f"SURVEY.md §2.9 covers all {len(registry_ids())} registered "
          "query-id stems")


if __name__ == "__main__":
    main()
