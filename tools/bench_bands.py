#!/usr/bin/env python3
"""Longitudinal per-query bench bands (VERDICT r13 #6): render every
round's BENCH_r*.json into one min/median/max table so regression triage
is a table lookup, not a forensic session. The r12/r13 experience: twice
now, >40% per-query "regressions" were ambient session noise — visible
immediately against the historical band, expensive to re-derive by hand.

Usage: python3 tools/bench_bands.py [repoRoot] > BENCH_BANDS.md

Parsing is defensive: the driver's "tail" field is a stdout scrape that
can truncate mid-JSON (BENCH_r04/r05 did), so a failed json.loads falls
back to regex-scraping the "name":sec pairs that DID survive.
"""
import glob
import json
import os
import re
import statistics
import sys


def parse_round(path):
    m = re.search(r"BENCH_r(\d+)\.json$", path)
    if not m:
        return None, {}
    rnd = int(m.group(1))
    try:
        doc = json.load(open(path))
    except Exception:
        return rnd, {}
    tail = doc.get("tail") or ""
    start = tail.rfind('{"metric":"total"')
    if start < 0:
        return rnd, {}
    blob = tail[start:]
    try:
        # raw_decode: the scraped tail carries the sbt epilogue after the
        # JSON line — parse the first value, ignore the rest
        parsed, _ = json.JSONDecoder().raw_decode(blob)
        return rnd, {k: float(v) for k, v in (parsed.get("queries") or {}).items()}
    except Exception:
        # truncated mid-object (r4/r5): scrape the pairs that survived,
        # bounded at the queries object's own closing brace so sibling
        # count fields ("omitted", "n", "value") can't pollute the series
        qpos = blob.find('"queries":{')
        if qpos < 0:
            return rnd, {}
        endpos = blob.find('}', qpos)
        if endpos < 0:
            endpos = len(blob)
        pairs = re.findall(r'"([A-Za-z0-9_]+)":(\d+(?:\.\d+)?)', blob[qpos + 10:endpos])
        return rnd, {k: float(v) for k, v in pairs}


def archive_full(root, rounds):
    """Persist the latest round's FULL per-query map (VERDICT r15 #3).

    The driver's BENCH_r{N}.json is a 2000-char stdout scrape — at 289+
    queries it carries only ~70 per-query timings ("omitted": 220 in
    r15). bench_out.json holds the complete map of the SAME run but is
    overwritten by the next round, silently losing the tail queries'
    longitudinal data. So: whenever bench_out.json's headline total
    matches the newest BENCH_r{N}.json (same run, exact same formatted
    value), freeze it as BENCH_FULL_r{NN}.json once; parsing below
    prefers the frozen archives.
    """
    full = os.path.join(root, "bench_out.json")
    if not rounds or not os.path.exists(full):
        return
    latest = max(rounds)
    dst = os.path.join(root, "BENCH_FULL_r%02d.json" % latest)
    if os.path.exists(dst):
        return
    try:
        doc = json.load(open(full))
        scraped = json.load(open(os.path.join(root, "BENCH_r%02d.json" % latest)))
        parsed = scraped.get("parsed") or {}
        if parsed.get("value") is not None and doc.get("value") == parsed.get("value"):
            with open(dst, "w") as f:
                json.dump(doc, f)
                f.write("\n")
    except Exception:
        pass


def main(root):
    rounds = {}
    for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        rnd, queries = parse_round(path)
        if rnd is not None and queries:
            rounds[rnd] = queries

    archive_full(root, rounds)

    # frozen full maps (BENCH_FULL_r*.json) are authoritative where they
    # exist: every query of that round, not the scrape's ~70
    for path in sorted(glob.glob(os.path.join(root, "BENCH_FULL_r*.json"))):
        m = re.search(r"BENCH_FULL_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            doc = json.load(open(path))
            target = rounds.setdefault(int(m.group(1)), {})
            for k, v in (doc.get("queries") or {}).items():
                target.setdefault(k, float(v))
        except Exception:
            pass

    # bench_out.json is the latest round's FULL line (every query; the
    # compact stdout line lists only ~70) — merge it into the newest
    # round without overwriting the driver-scraped values, and ONLY if
    # its headline total matches that round (a local dev bench run
    # overwrites bench_out.json and must not leak into the round series)
    full = os.path.join(root, "bench_out.json")
    if rounds and os.path.exists(full):
        try:
            doc = json.load(open(full))
            latest_n = max(rounds)
            scraped = json.load(
                open(os.path.join(root, "BENCH_r%02d.json" % latest_n)))
            parsed = scraped.get("parsed") or {}
            if parsed.get("value") is not None and \
                    doc.get("value") == parsed.get("value"):
                latest = rounds[latest_n]
                for k, v in (doc.get("queries") or {}).items():
                    latest.setdefault(k, float(v))
        except Exception:
            pass

    series = {}
    for rnd, queries in rounds.items():
        for name, sec in queries.items():
            series.setdefault(name, {})[rnd] = sec

    last_round = max(rounds) if rounds else 0
    print("# BENCH_BANDS.md — longitudinal per-query bench bands")
    print()
    print(f"Generated by `tools/bench_bands.py` from BENCH_r*.json "
          f"(rounds {min(rounds)}–{last_round}; seconds at sf0.1, local[32]).")
    print("`last/med` > 1.5 lands on the watch list below — check the band")
    print("before treating it as a regression: whole-session slowdowns move")
    print("every query together (r12, r13 precedents), code regressions move one.")
    print()

    rows = []
    for name in sorted(series):
        vals = series[name]
        xs = sorted(vals.values())
        med = statistics.median(xs)
        last = vals.get(last_round)
        ratio = (last / med) if (last is not None and med > 0) else None
        rows.append((name, len(xs), min(xs), med, max(xs), last, ratio))

    print("| query | runs | min | median | max | last | last/med |")
    print("|---|---|---|---|---|---|---|")
    for name, n, lo, med, hi, last, ratio in rows:
        last_s = f"{last:.2f}" if last is not None else "—"
        ratio_s = f"{ratio:.2f}" if ratio is not None else "—"
        print(f"| {name} | {n} | {lo:.2f} | {med:.2f} | {hi:.2f} "
              f"| {last_s} | {ratio_s} |")

    watch = [(r[0], r[5], r[3], r[6]) for r in rows
             if r[6] is not None and r[6] > 1.5 and r[1] >= 3]
    print()
    print(f"## Watch list (last > 1.5× median, ≥3 runs): {len(watch)}")
    print()
    if watch:
        print("| query | last | median | ratio | max ever |")
        print("|---|---|---|---|---|")
        for name, last, med, ratio in sorted(watch, key=lambda t: -t[3]):
            hi = max(series[name].values())
            print(f"| {name} | {last:.2f} | {med:.2f} | {ratio:.2f} | {hi:.2f} |")
    else:
        print("(none)")

    totals = {rnd: sum(qs.values()) for rnd, qs in rounds.items()}
    print()
    print("## Per-round totals (sum of parsed per-query seconds)")
    print()
    print("| round | queries parsed | total s |")
    print("|---|---|---|")
    for rnd in sorted(totals):
        print(f"| r{rnd} | {len(rounds[rnd])} | {totals[rnd]:.1f} |")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
