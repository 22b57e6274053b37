#!/usr/bin/env python3
"""Regenerate CORRECTNESS_SF01.json from a verify_local.py run log.

Usage: python3 tools/make_sf01_artifact.py <verify_log> <out.json> \
           [round] [sf_dir] [why...]

Parses the PASS/SKIP/FAIL lines verify_local.py prints and emits the
standing sweep artifact (per-query status + rows + hash_match), so the
artifact is always cut from ONE full run rather than hand-patched.
"""
import sys, json, re, datetime


def main(log_path, out_path, rnd, sf_dir, why):
    queries = {}
    for line in open(log_path):
        m = re.match(r"PASS (\S+) \((\d+) rows\)", line)
        if m:
            queries[m.group(1)] = {"status": "pass",
                                   "rows": int(m.group(2)),
                                   "hash_match": True}
            continue
        m = re.match(r"SKIP\(rows-only\) (\S+): rows=(\d+)", line)
        if m:
            queries[m.group(1)] = {"status": "no_oracle",
                                   "rows": int(m.group(2))}
            continue
        m = re.match(r"(FAIL|ORACLE-ERROR|EMPTY-DUMP|MISSING-DUMP) (\S+)",
                     line)
        if m:
            queries[m.group(2).rstrip(":")] = {
                "status": "fail", "detail": line.strip()[:300]}
    # Summary counts derive from the FINAL per-query dict, not from
    # per-line increments: a log that carries multiple status lines for
    # the same query (e.g. a FAIL followed by a rerun's PASS appended
    # to the same file) keeps only the last status per query, and the
    # summary must agree with that map.
    n_pass = sum(1 for q in queries.values() if q["status"] == "pass")
    n_skip = sum(1 for q in queries.values() if q["status"] == "no_oracle")
    n_fail = sum(1 for q in queries.values() if q["status"] == "fail")
    artifact = {
        "_meta": {
            "sf_dir": sf_dir,
            "date": datetime.date.today().isoformat(),
            "round": int(rnd),
            "harness": ("sbt runMain graft.Verify /root/testdata/sf0.1 + "
                        "tools/verify_local.py (DuckDB oracle, hash-exact "
                        "value compare)"),
            "summary": {"pass": n_pass, "no_oracle": n_skip,
                        "fail": n_fail},
            "why": why,
        },
        "queries": dict(sorted(queries.items())),
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_path}: {n_pass} pass, {n_skip} no_oracle, "
          f"{n_fail} fail, {len(queries)} queries")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit("usage: make_sf01_artifact.py <verify_log> <out.json> "
                 "[round] [sf_dir] [why...]")
    main(sys.argv[1], sys.argv[2],
         sys.argv[3] if len(sys.argv) > 3 else "13",
         sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1",
         " ".join(sys.argv[5:]) or
         "Standing sweep artifact regenerated from ONE full run at "
         "final HEAD (artifacts are re-cut after the LAST catalog "
         "change, never patched past it).")
