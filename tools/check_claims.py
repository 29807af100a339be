#!/usr/bin/env python
"""Mechanically verify that README/CLAUDE perf claims match committed artifacts.

Round 2 and round 3 both shipped README numbers that their cited artifact
did not contain (VERDICT r03 weak #4). This ends that class of drift:

Every perf claim in README.md / CLAUDE.md must sit next to a marker line

    <!-- perf-claims: <artifact.json> key=val key=val ... -->

and this script asserts, for each marker:
  1. the artifact file exists and parses as JSON (first JSON object found
     if the file is a driver wrapper with a "parsed" field, that is used);
  2. each key=val matches the artifact value within 0.015 (print rounding);
  3. each claimed value literally appears in the surrounding document text
     (so the marker cannot drift from the prose it certifies).

Usage: python tools/check_claims.py        (exit 0 = all claims verified)
Run it before committing any perf-number edit; tests/test_claims.py runs it
in the default gate.
"""

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARKER = re.compile(r"<!--\s*perf-claims:\s*(\S+)\s+([^>]*?)-->")


def artifact_values(path):
    with open(path) as f:
        data = json.load(f)
    if isinstance(data, dict) and isinstance(data.get("parsed"), dict):
        data = data["parsed"]     # driver wrapper (BENCH_r*.json)
    return data


def check_file(doc_path):
    errors = []
    with open(doc_path) as f:
        text = f.read()
    n_markers = 0
    for m in MARKER.finditer(text):
        n_markers += 1
        art_name, claims = m.group(1), m.group(2)
        art_path = os.path.join(ROOT, art_name)
        try:
            data = artifact_values(art_path)
        except Exception as e:
            errors.append(f"{doc_path}: artifact {art_name}: {e}")
            continue
        for kv in claims.split():
            key, _, val = kv.partition("=")
            claimed = float(val)
            # dotted keys walk nested artifacts (robustness_value.psnr_...)
            node = data
            try:
                for part in key.split("."):
                    node = node[part]
                actual = float(node)
            except (KeyError, TypeError):
                errors.append(f"{doc_path}: {art_name} has no key '{key}' "
                              f"(claimed {val})")
                continue
            if abs(actual - claimed) > 0.015:
                errors.append(f"{doc_path}: claim {key}={val} but {art_name} "
                              f"has {actual}")
            if val not in text:
                errors.append(f"{doc_path}: claimed value {val} ({key}) does "
                              f"not appear in the document text")
    return n_markers, errors


def main():
    total, all_errors = 0, []
    for doc in ("README.md", "CLAUDE.md"):
        n, errs = check_file(os.path.join(ROOT, doc))
        total += n
        all_errors += errs
    if all_errors:
        for e in all_errors:
            print("CLAIM MISMATCH:", e)
        sys.exit(1)
    print(f"all perf claims verified ({total} markers)")


if __name__ == "__main__":
    main()
