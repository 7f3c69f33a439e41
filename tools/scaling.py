#!/usr/bin/env python3
"""Tabulate per-query executor metrics captured by Bench's
SPARK_GRAFT_METRICS=1 mode (#metrics stderr lines) across scale factors.

Usage:
  python3 tools/scaling.py sf0.1:/tmp/m01.err sf1:/tmp/m1.err [sf10:...]

For each labeled stderr file, parses every `#metrics <query> sec=..
shufRead=.. shufWrite=.. spillMem=.. spillDisk=.. input=.. cpuMs=..
tasks=..` line; when a query appears in multiple passes, keeps the pass
with the minimum wall-clock (same convention as the bench total). Emits
markdown: a per-SF top-shuffler table and, when 2+ SFs are given, a
cross-SF growth table (bytes ratios vs the data ratio) that names any
query whose shuffle grows superlinearly in the data.
"""
import re
import sys

LINE = re.compile(
    r"#metrics\s+(\S+)\s+sec=([0-9.]+)\s+shufRead=(-?\d+)\s+"
    r"shufWrite=(-?\d+)\s+spillMem=(-?\d+)\s+spillDisk=(-?\d+)\s+"
    r"input=(-?\d+)\s+cpuMs=(-?\d+)\s+tasks=(-?\d+)"
    r"(?:\s+gcMs=(-?\d+)\s+peakTaskMem=(-?\d+)\s+storageUsed=(-?\d+))?")

FIELDS = ["sec", "shufRead", "shufWrite", "spillMem", "spillDisk",
          "input", "cpuMs", "tasks", "gcMs", "peakTaskMem", "storageUsed"]


def parse(path):
    best = {}
    with open(path, errors="replace") as f:
        for line in f:
            m = LINE.search(line)
            if not m:
                continue
            q = m.group(1)
            vals = dict(zip(FIELDS, [float(m.group(2))] +
                            [int(g) if g is not None else 0
                             for g in m.groups()[2:]]))
            if q not in best or vals["sec"] < best[q]["sec"]:
                best[q] = vals
    return best


def human(n):
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if abs(n) < 1024 or unit == "TB":
            return f"{n:.1f}{unit}" if unit != "B" else f"{int(n)}B"
        n /= 1024.0
    return f"{n:.1f}TB"


def sf_value(label):
    m = re.search(r"sf([0-9.]+)", label)
    return float(m.group(1)) if m else None


def main():
    runs = []
    for arg in sys.argv[1:]:
        label, path = arg.split(":", 1)
        runs.append((label, parse(path)))
    if not runs:
        print(__doc__)
        return 1

    for label, data in runs:
        print(f"## {label} — top shuffle/spill queries "
              f"({len(data)} queries measured)\n")
        print("| query | sec | shuffle write | shuffle read | spill (mem) "
              "| spill (disk) | scan input | cpu s | tasks |")
        print("|---|---|---|---|---|---|---|---|---|")
        top = sorted(data.items(),
                     key=lambda kv: -(kv[1]["shufWrite"] + kv[1]["spillDisk"]))
        for q, v in top[:15]:
            print(f"| {q} | {v['sec']:.2f} | {human(v['shufWrite'])} | "
                  f"{human(v['shufRead'])} | {human(v['spillMem'])} | "
                  f"{human(v['spillDisk'])} | {human(v['input'])} | "
                  f"{v['cpuMs']/1000:.1f} | {v['tasks']} |")
        tot = {f: sum(v[f] for v in data.values()) for f in FIELDS}
        # the three gauges (round 11) are max-style, not additive
        peaks = {f: max((v[f] for v in data.values()), default=0)
                 for f in ("gcMs", "peakTaskMem", "storageUsed")}
        print(f"\nBattery totals: shuffle write {human(tot['shufWrite'])}, "
              f"read {human(tot['shufRead'])}, spill mem "
              f"{human(tot['spillMem'])} / disk {human(tot['spillDisk'])}, "
              f"scan input {human(tot['input'])}, cpu {tot['cpuMs']/1000:.0f} s, "
              f"tasks {tot['tasks']}.")
        if any(peaks.values()):
            print(f"Gauges (max over queries): per-query gc {peaks['gcMs']} ms, "
                  f"single-task peak exec mem {human(peaks['peakTaskMem'])}, "
                  f"storage occupancy {human(peaks['storageUsed'])}.")
        print()

    for (l0, d0), (l1, d1) in zip(runs, runs[1:]):
        s0, s1 = sf_value(l0), sf_value(l1)
        data_ratio = (s1 / s0) if (s0 and s1) else None
        hdr = f"## Shuffle growth {l0} → {l1}"
        if data_ratio:
            hdr += f" (data ×{data_ratio:g})"
        print(hdr + "\n")
        rows, shifts = [], []
        for q in sorted(set(d0) & set(d1)):
            w0, w1 = d0[q]["shufWrite"], d1[q]["shufWrite"]
            if w1 < 1 << 20:  # sub-MB at the larger SF: nothing to grade
                continue
            secr = d1[q]["sec"] / d0[q]["sec"] if d0[q]["sec"] > 0 else 0
            if w0 < 1 << 18:
                # a near-zero baseline that becomes real shuffle is a PLAN
                # SHIFT (a small side crossing the broadcast threshold),
                # not byte growth — grading it as a ratio is meaningless
                shifts.append((q, w0, w1))
                continue
            rows.append((q, w0, w1, w1 / w0, secr))
        rows.sort(key=lambda r: -r[3])
        print("| query | shufWrite " + l0 + " | shufWrite " + l1 +
              " | ratio | sec ratio | verdict |")
        print("|---|---|---|---|---|---|")
        for q, w0, w1, ratio, secr in rows:
            verdict = "linear-or-better"
            if data_ratio and ratio > 1.25 * data_ratio:
                verdict = "SUPERLINEAR"
            elif data_ratio and ratio > data_ratio:
                verdict = "~linear"
            print(f"| {q} | {human(w0)} | {human(w1)} | {ratio:.2f}x | "
                  f"{secr:.2f}x | {verdict} |")
        if shifts:
            print(f"\nPlan shifts (broadcast→shuffle as a side outgrew the "
                  f"threshold; baseline <256KB so a growth ratio is not "
                  f"meaningful): " + ", ".join(
                      f"{q} ({human(w0)}→{human(w1)})"
                      for q, w0, w1 in shifts))
        print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
