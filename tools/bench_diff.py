#!/usr/bin/env python3
"""Compare two Bench artifacts (the one-line JSON with a per-query map).

Usage: python3 tools/bench_diff.py OLD.json NEW.json [min_ratio]

Prints per-query ratios sorted by regression, plus adds/removes —
the honest way to read round-over-round numbers on a noisy VM
(BASELINE.md documents 2-20x single-query noise bursts; a consistent
ratio across MANY queries is signal, one spike is not).
"""
import json
import re
import sys


def load(path):
    text = open(path).read()
    # full artifact: the one-line {"metric": ..., "queries": {...}} form
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                pass
    # driver wrapper with a (possibly truncated) "tail" capture: salvage
    # whatever "name":seconds pairs survive. Anchor to the "queries"
    # object when one is present so unrelated "name":float pairs
    # elsewhere in the wrapper don't leak into the map.
    m = re.search(r'\\?"queries\\?":\s*\{', text)
    scope = text[m.end():] if m else text
    if m:
        # stop at the first unescaped close brace of the queries object
        # (query maps are flat, so the first '}' ends it)
        scope = scope.split("}", 1)[0]
    # the lookbehind rejects the wrapper's own '"tail": "' opening quote
    # gluing onto a front-truncated first key (e.g. '…_json' cut to 'n')
    pairs = dict(
        (k, float(v))
        for k, v in re.findall(
            r'(?<!"tail": )\\?"([a-z0-9_]+)\\?":([0-9]+\.[0-9]+)', scope)
        if k not in ("value", "sf")
    )
    if pairs:
        return {"value": sum(pairs.values()), "queries": pairs,
                "partial": True}
    raise SystemExit(f"no bench data found in {path}")


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    min_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    rows = [(nq[k] / oq[k] if oq[k] > 0 else float("inf"), k) for k in common]
    rows.sort(reverse=True)
    # guard like the per-query path: a salvaged/empty artifact can have
    # total 0, which must read as "no baseline", not a crash
    ratio = (f"{new['value'] / old['value']:.2f}"
             if old.get("value") else "n/a (old total 0)")
    print(f"total: {old.get('value', 0.0):.1f}s ({len(oq)}q) -> "
          f"{new.get('value', 0.0):.1f}s ({len(nq)}q)  "
          f"ratio {ratio}")
    # per-query 1-min loadavg at observation start ("load" field, r19+):
    # flag readings taken under co-tenant pressure so a "regression" on
    # a burst-hit query reads as suspect, not as code
    def burst(art, k, thresh=8.0):
        ls = art.get("load", {}).get(k)
        return bool(ls) and max(ls) >= thresh
    def tag(k):
        marks = ("old-burst" if burst(old, k) else "") + \
                (" new-burst" if burst(new, k) else "")
        return f"  [{marks.strip()}]" if marks.strip() else ""
    slower = [(r, k) for r, k in rows if r >= min_ratio]
    faster = [(r, k) for r, k in rows if r <= 1 / min_ratio]
    if slower:
        print(f"\nslower >= {min_ratio}x:")
        for r, k in slower:
            print(f"  {r:6.2f}x  {oq[k]:7.2f}s -> {nq[k]:7.2f}s  {k}{tag(k)}")
    if faster:
        print(f"\nfaster >= {min_ratio}x:")
        for r, k in reversed(faster):
            print(f"  {r:6.2f}x  {oq[k]:7.2f}s -> {nq[k]:7.2f}s  {k}{tag(k)}")
    added, removed = sorted(set(nq) - set(oq)), sorted(set(oq) - set(nq))
    if added:
        print(f"\nadded: {', '.join(added)}")
    if removed:
        print(f"\nremoved: {', '.join(removed)}")


if __name__ == "__main__":
    main()
