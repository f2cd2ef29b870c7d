"""Align two head-to-head metrics JSONL files (torch arm vs ips arm)
into epoch tables + summary stats for RESULTS.md.

Both h2h harnesses (scripts/ref_headtohead_image.py,
scripts/ref_headtohead_traffic.py) emit one JSON line per epoch+split
with identical keys (<task>_loss, <task>_<metric>). This prints:
  - a per-epoch table of train avg-loss and the chosen test metrics,
  - mean |d| of the train-loss tracks (the round-4 parity statistic),
  - best/final test metrics per task with the absolute gap.

Usage:
  python scripts/h2h_table.py results/ref_h2h_image_mid_torch.jsonl \
      results/ref_h2h_image_mid_ips.jsonl [--every 2]
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path):
    train, test = {}, {}
    for line in open(path):
        r = json.loads(line)
        (train if r["split"] == "train" else test)[r["epoch"]] = r
    return train, test


def task_keys(rec):
    losses = sorted(k for k in rec if k.endswith("_loss"))
    metrics = sorted(k for k in rec
                     if not k.endswith("_loss")
                     and k not in ("epoch", "split", "lr", "train_seconds"))
    return losses, metrics


def avg_loss(rec, losses):
    return sum(rec[k] for k in losses) / len(losses)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("torch_jsonl")
    p.add_argument("ips_jsonl")
    p.add_argument("--every", type=int, default=1)
    a = p.parse_args()

    t_train, t_test = load(a.torch_jsonl)
    i_train, i_test = load(a.ips_jsonl)
    epochs = sorted(set(t_train) & set(i_train))
    if not epochs:
        sys.exit("no overlapping train epochs")
    losses, metrics = task_keys(t_train[epochs[0]])

    print(f"| epoch | torch train loss | ips train loss | |d| |"
          + " torch/ips test |" * len(metrics))
    print("|---|---|---|---|" + "---|" * len(metrics))
    deltas = []
    for e in epochs:
        tl = avg_loss(t_train[e], losses)
        il = avg_loss(i_train[e], losses)
        deltas.append(abs(tl - il))
        if e % a.every and e != epochs[-1]:
            continue
        row = f"| {e} | {tl:.3f} | {il:.3f} | {abs(tl - il):.3f} |"
        for m in metrics:
            tv = t_test.get(e, {}).get(m)
            iv = i_test.get(e, {}).get(m)
            row += (f" {tv:.3f}/{iv:.3f} |"
                    if tv is not None and iv is not None else " - |")
        print(row)

    print(f"\ntrain-loss track mean |d| over {len(epochs)} epochs: "
          f"{sum(deltas)/len(deltas):.4f} (max {max(deltas):.4f})")
    for m in metrics:
        tb = max((r[m] for r in t_test.values() if m in r), default=None)
        ib = max((r[m] for r in i_test.values() if m in r), default=None)
        if tb is None or ib is None:
            continue
        tf = t_test[max(t_test)][m]
        fi = i_test[max(i_test)][m]
        print(f"{m}: best torch {tb:.4f} vs ips {ib:.4f} "
              f"(gap {abs(tb-ib):.4f}); final {tf:.4f} vs {fi:.4f} "
              f"(gap {abs(tf-fi):.4f})")


if __name__ == "__main__":
    main()
