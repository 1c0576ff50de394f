"""Aggregate held-out ablation runs into the four-arm table (VERDICT r4
items 1-2).

Scans convergence_run.py result trees (one workdir per run, any number of
seeds per arm), extracts each run's best/last val Y-PSNR + best epoch
from its summary.csv, groups by arm, and prints:

  * the per-seed numbers,
  * mean +/- half-range of the best-epoch val Y-PSNR per arm,
  * the (b)-(a) and (c|d)-(b) deltas vs the observed seed spread — the
    honesty gate the round-4 verdict asked for: a delta only counts if
    it exceeds the spread.

Arms are recognised from the experiment directory name emitted by
convergence_run.py (convergence_rcan_* = (a), convergence_bobw_matched*
= (b), convergence_bobw_warm_matched* = (c), convergence_bobw_ft_matched*
= (d); _sN suffix = seed N).

Usage: python examples/ablation_report.py /tmp/r5_arm* /tmp/rumpy_conv_arm*
"""

import glob
import os
import re
import sys

ARM_PATTERNS = [
    # order matters: ft/warm before plain bobw
    ("d", re.compile(r"convergence_bobw_ft(_|$)")),
    ("c", re.compile(r"convergence_bobw_warm(_|$)")),
    ("b", re.compile(r"convergence_bobw(_|$)")),
    ("a", re.compile(r"convergence_rcan(_|$)")),
    ("dan", re.compile(r"convergence_dan(_|$)")),
    ("ikc", re.compile(r"convergence_ikc(_|$)")),
]
ARM_LABELS = {
    "a": "(a) blind RCAN",
    "b": "(b) BoBW, frozen random-init encoder",
    "c": "(c) BoBW, frozen pretrained encoder",
    "d": "(d) BoBW, pretrained encoder finetuned",
    "dan": "DAN v1",
    "ikc": "IKC",
}


def classify(exp_name):
    for arm, pat in ARM_PATTERNS:
        if pat.match(exp_name):
            m = re.search(r"_s(\d+)$", exp_name)
            return arm, int(m.group(1)) if m else 0
    return None, None


def collect(workdirs):
    rows = []
    for wd in workdirs:
        for summary in glob.glob(os.path.join(
                wd, "Results", "*", "result_outputs", "summary.csv")):
            exp = os.path.basename(os.path.dirname(os.path.dirname(summary)))
            arm, seed = classify(exp)
            if arm is None:
                continue
            import pandas as pd
            df = pd.read_csv(summary)
            cols = [c for c in df.columns
                    if c.startswith("val-") and "PSNR" in c]
            if not cols or not len(df):
                continue
            col = df[cols[0]]
            rows.append({
                "arm": arm, "seed": seed, "exp": exp,
                "n_epochs": len(df),
                "best": float(col.max()),
                "best_epoch": int(df["epoch"].iloc[int(col.idxmax())]),
                "last": float(col.iloc[-1]),
                "matched": "_matched" in exp or arm in ("a",),
            })
    return rows


def report(rows, bicubic=25.114):
    from collections import defaultdict
    by_arm = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r["arm"], r["seed"])):
        by_arm[r["arm"]].append(r)
        print(f"  {ARM_LABELS.get(r['arm'], r['arm']):44s} seed {r['seed']}"
              f"  best {r['best']:.3f} (ep {r['best_epoch']:2d})"
              f"  last {r['last']:.3f}   [{r['exp']}]")
    print()
    stats = {}
    for arm, rs in by_arm.items():
        bests = [r["best"] for r in rs]
        mean = sum(bests) / len(bests)
        spread = (max(bests) - min(bests)) / 2 if len(bests) > 1 else None
        stats[arm] = (mean, spread, len(bests))
        sp = f"+/- {spread:.3f} (n={len(bests)})" if spread is not None \
            else f"(single seed)"
        print(f"{ARM_LABELS.get(arm, arm):44s} best {mean:.3f} {sp}"
              f"   vs bicubic {mean - bicubic:+.3f}")
    print()
    spreads = [s for _, s, _ in stats.values() if s is not None]
    max_spread = max(spreads) if spreads else None
    for hi, lo, name in (("b", "a", "(b)-(a)"), ("c", "b", "(c)-(b)"),
                         ("d", "b", "(d)-(b)"), ("d", "c", "(d)-(c)")):
        if hi in stats and lo in stats:
            delta = stats[hi][0] - stats[lo][0]
            if max_spread is not None:
                verdict = ("EXCEEDS max per-arm seed half-range "
                           f"{max_spread:.3f}" if abs(delta) > max_spread
                           else "within seed noise "
                           f"(half-range {max_spread:.3f})")
            else:
                verdict = "seed spread unmeasured (single-seed arms)"
            print(f"delta {name}: {delta:+.3f} dB — {verdict}")
    return stats


if __name__ == "__main__":
    dirs = sys.argv[1:] or sorted(
        glob.glob("/tmp/r5_arm*") + glob.glob("/tmp/rumpy_conv_arm*"))
    dirs = [d for d in dirs if os.path.isdir(d)]
    rows = collect(dirs)
    if not rows:
        sys.exit(f"no summary.csv found under {dirs}")
    report(rows)
