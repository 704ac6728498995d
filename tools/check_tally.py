#!/usr/bin/env python3
"""Tally honesty gate (round-7 process fix).

The ONLY authority for "hash-verified" counts is the driver's
CORRECTNESS_r*.json artifact. Builder-side sweeps (check_parity.py) predict
the driver result but must never be quoted as it — r6 claimed 150 while the
driver artifact said 147.

Contract enforced here:
  * Any driver-backed tally in SURVEY.md / README.md must be written as
        driver-verified: <pass>/<total> per CORRECTNESS_rNN
    and is checked against that exact artifact.
  * Any other "N hash-verified" number must be labelled as a builder sweep
    ("builder sweep" on the same line), otherwise it is flagged.

Exit 0 = all claims trace to artifacts; exit 1 = discrepancy.
"""
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def artifact_counts(name):
    path = os.path.join(REPO, name + ".json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        data = json.load(f)
    total = len(data)
    passed = sum(1 for v in data.values() if v.get("hash_match") is True)
    rows_only = sum(1 for v in data.values() if v.get("err") == "no_oracle")
    failed = sum(1 for v in data.values() if v.get("hash_match") is False)
    return total, passed, rows_only, failed


def main():
    ok = True
    latest = sorted(
        f[:-5] for f in os.listdir(REPO)
        if re.fullmatch(r"CORRECTNESS_r\d+\.json", f))
    if latest:
        t, p, r, f = artifact_counts(latest[-1])
        print(f"[tally] latest artifact {latest[-1]}: {t} declared, "
              f"{p} hash-verified, {r} rows-only, {f} failing")

    claim_re = re.compile(
        r"driver-verified:\s*(\d+)\s*/\s*(\d+)\s+per\s+(CORRECTNESS_r\d+)")
    bare_re = re.compile(r"(\d+)\s+hash-verified")
    for doc in ("SURVEY.md", "README.md"):
        path = os.path.join(REPO, doc)
        if not os.path.exists(path):
            continue
        for ln, line in enumerate(open(path), 1):
            for m in claim_re.finditer(line):
                want_p, want_t, art = int(m.group(1)), int(m.group(2)), m.group(3)
                counts = artifact_counts(art)
                if counts is None:
                    print(f"[tally] FAIL {doc}:{ln} cites missing {art}")
                    ok = False
                elif (counts[1], counts[0]) != (want_p, want_t):
                    print(f"[tally] FAIL {doc}:{ln} claims {want_p}/{want_t} "
                          f"but {art} says {counts[1]}/{counts[0]}")
                    ok = False
                else:
                    print(f"[tally] OK   {doc}:{ln} {want_p}/{want_t} "
                          f"matches {art}")
            if bare_re.search(line) and not claim_re.search(line) \
                    and "builder sweep" not in line:
                print(f"[tally] FAIL {doc}:{ln} bare 'hash-verified' count "
                      f"without artifact citation or 'builder sweep' label: "
                      f"{line.strip()[:100]}")
                ok = False
    if not ok:
        sys.exit(1)
    print("[tally] all tallies trace to driver artifacts")


if __name__ == "__main__":
    main()
