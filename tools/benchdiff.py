#!/usr/bin/env python3
"""Per-query bench regression gate.

Compares two bench JSON lines (driver `BENCH_r{N}.json` or a local
`graft.Bench` capture): prints a markdown delta table sorted by ratio and
flags any query slower than FLAG_RATIO x the old time (ignoring noise
below MIN_SEC). Exit code 1 when a regression is flagged, so the check
can gate a round. Round 3 shipped a 2.6-3.3x regression on q65/q66
unnoticed; this is the tool that would have caught it.

Usage: benchdiff.py OLD.json NEW.json [NEW2.json ...] [--all]

With more than one NEW capture, the comparison uses the per-query MIN
across them (a query must appear in every capture). Rationale: on a
co-tenant builder host, any single run flags whichever sub-second
queries a load spike happened to land on; a REAL regression is slow in
EVERY run, so the min arbitrates host noise out while keeping genuine
slowdowns flagged (round-6 measured disjoint flag sets across two
back-to-back runs — q71/q68 in one, q47-q51 in the other — and the min
cleared both).
"""
import json
import re
import sys

FLAG_RATIO = 1.5
MIN_SEC = 0.5  # both-sides-under-this = timer noise at sf0.1, never flagged


def load(path):
    """Accepts either a raw graft.Bench line ({"metric",...,"queries":{}})
    or the driver's wrapper, which keeps only a 2000-char tail of that
    line — per-query pairs are regexed out of whatever survived.
    `full` records whether the capture is complete: only then is a
    query's absence on the OTHER side meaningful."""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return {"queries": d["queries"], "value": d.get("value"),
                "full": True}
    text = d.get("tail", "")
    pairs = dict(
        (m.group(1), float(m.group(2)))
        for m in re.finditer(r'"(q\w+)":([0-9.]+)', text))
    total = re.search(r'"value":([0-9.]+)', text)
    return {"queries": pairs,
            "value": float(total.group(1)) if total else None,
            "full": False}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    show_all = "--all" in sys.argv
    old = load(args[0])
    new = load(args[1])
    for extra_path in args[2:]:
        extra = load(extra_path)
        eq = extra["queries"]
        # min over captures; a query missing from ANY full capture stays
        # missing so the MISSING gate still fires
        merged = {}
        for name in set(new["queries"]) | set(eq):
            a, b = new["queries"].get(name), eq.get(name)
            if a is None or b is None:
                if not (new["full"] and extra["full"]):
                    merged[name] = a if a is not None else b
            else:
                merged[name] = min(a, b)
        new = {"queries": merged,
               "value": min(v for v in (new["value"], extra["value"])
                            if v is not None)
               if (new["value"] or extra["value"]) else None,
               "full": new["full"] and extra["full"]}
    oq, nq = old["queries"], new["queries"]
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if b is None and new["full"]:
            # the NEW side is a full capture, so a query present in the
            # old run but absent from the new one crashed or was
            # dropped — that must not pass the gate silently. (When the
            # new side is tail-truncated, absence proves nothing; the
            # old side's completeness is irrelevant — its entry already
            # proves the query existed.)
            rows.append((float("inf"), name, a, b, "MISSING"))
            continue
        if a is None or b is None:
            # absent from a tail-truncated baseline is not "new"
            rows.append((0.0, name, a, b, ""))
            continue
        ratio = b / a if a > 0 else float("inf")
        flag = "REGRESSION" if (
            ratio > FLAG_RATIO and max(a, b) >= MIN_SEC) else ""
        rows.append((ratio, name, a, b, flag))
    rows.sort(key=lambda r: (r[0], r[1]), reverse=True)
    flagged = [r for r in rows if r[4] in ("REGRESSION", "MISSING")]
    print(f"| query | old s | new s | ratio | flag |")
    print(f"|---|---|---|---|---|")
    for ratio, name, a, b, flag in rows:
        if not show_all and not flag and ratio <= FLAG_RATIO and name not in (
                "q61_stage004", "q62_mart_explode", "q63_h3_stats",
                "q65_query_stats", "q66_query_heatmap"):
            continue
        fa = "-" if a is None else f"{a:.2f}"
        fb = "-" if b is None else f"{b:.2f}"
        fr = "-" if a is None or b is None else f"{ratio:.2f}x"
        print(f"| {name} | {fa} | {fb} | {fr} | {flag} |")
    print()
    ov = "?" if old["value"] is None else f"{old['value']:.1f}s"
    nv = "?" if new["value"] is None else f"{new['value']:.1f}s"
    print(f"total: {ov} -> {nv}; "
          f"{len(flagged)} regression(s) flagged "
          f"(>{FLAG_RATIO}x and >={MIN_SEC}s)")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
