"""Cross-seed summary of the CoCLR cycle-drive artifacts.

Aggregates every DRIVE_coclr_cycle*.json at the repo root (each an
independent replication of the reference recipe, README.md:28-56 of
/root/reference, at synthetic scale: tools/drive_coclr_cycle.py --seed N)
into one held-out NN-retrieval table: R@1 per modality at init, after the
cycle-1 mining pass, and after cycle 2, with binomial sigma vs chance.

Usage: python tools/summarize_drives.py [--root .] [--markdown]
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os

STAGES = ("init", "coclr", "cycle2")


def load_drives(root: str):
    out = []
    for path in sorted(glob.glob(os.path.join(root, "DRIVE_coclr_cycle*.json"))):
        with open(path) as f:
            d = json.load(f)
        seed = d.get("config", {}).get("seed", 0)
        row = {"file": os.path.basename(path), "seed": seed,
               "chance": d.get("chance_R@1"),
               "queries": None, "r1": {}}
        for mod in ("rgb", "flow"):
            for stage in STAGES:
                ph = d["phases"].get(f"retrieval_{mod}_{stage}")
                if ph is not None:
                    row["r1"][(mod, stage)] = ph["R@1"]
        out.append(row)
    return out


def sigma_at_chance(chance: float, n: int) -> float:
    return math.sqrt(chance * (1.0 - chance) / n)


def summarize(drives, n_queries: int = 72):
    """Per-seed best-post-mining R@1 and the cross-seed improvement count.
    n_queries: held-out query count (n_classes*test_groups*n_clips in the
    drive config; 72 for the committed v2 protocol)."""
    lines = []
    improved = {"rgb": 0, "flow": 0}
    total = {"rgb": 0, "flow": 0}
    for d in drives:
        chance = d["chance"]
        sig = sigma_at_chance(chance, n_queries)
        for mod in ("rgb", "flow"):
            init = d["r1"].get((mod, "init"))
            post = [d["r1"][k] for k in ((mod, "coclr"), (mod, "cycle2"))
                    if k in d["r1"]]
            if init is None or not post:
                continue
            best = max(post)
            total[mod] += 1
            improved[mod] += best > init
            lines.append({
                "seed": d["seed"], "modality": mod, "init": init,
                "best_post_mining": best,
                "delta_sigma": (best - init) / sig,
                "vs_chance_sigma": (best - chance) / sig,
            })
    return lines, improved, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    ap.add_argument("--queries", type=int, default=72)
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()

    drives = load_drives(args.root)
    lines, improved, total = summarize(drives, args.queries)
    if args.markdown:
        print("| seed | modality | init R@1 | best post-mining | delta (sigma) | vs chance (sigma) |")
        print("|---|---|---|---|---|---|")
        for r in lines:
            print("| {seed} | {modality} | {init:.3f} | {best_post_mining:.3f} "
                  "| {delta_sigma:+.1f} | {vs_chance_sigma:+.1f} |".format(**r))
        for mod in ("rgb", "flow"):
            print(f"\n{mod}: best post-mining beats init in "
                  f"{improved[mod]}/{total[mod]} seeds")
    else:
        print(json.dumps({"rows": lines, "improved": improved,
                          "total": total}, indent=1))


if __name__ == "__main__":
    main()
