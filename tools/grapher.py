"""Offline analysis of LSA training logs (result.txt).

Script version of the reference's grapher notebook
(reference: grapher.ipynb cells 0-7; README.md:173-205): parse the
``psnr : [...] / loss : [...]`` log, detect corrupted entries, window-average
the curves, and plot PSNR/loss to result.png.

Usage: python tools/grapher.py <run_dir_or_result.txt> [--window 100]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_file(path):
    """Parse result.txt -> dict of lists. Tolerates corrupt tokens (kept as
    raw strings for the sanity checker)."""
    data = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            key, val = line.split(":", 1)
            tokens = [t.strip() for t in val.strip().strip("[]").split(",")
                      if t.strip()]
            data[key.strip()] = [preprocess_value(t) for t in tokens]
    return data


def preprocess_value(token):
    try:
        return float(token)
    except ValueError:
        return token  # corrupted entry, surfaced by check_anomalies


def check_anomalies(values):
    """Indices of non-numeric / non-finite entries."""
    bad = []
    for i, v in enumerate(values):
        if not isinstance(v, float) or not np.isfinite(v):
            bad.append(i)
    return bad


def find_data_at_index(data, index, context=2):
    out = {}
    for key, values in data.items():
        lo, hi = max(0, index - context), min(len(values), index + context + 1)
        out[key] = values[lo:hi]
    return out


def sanity_checker(path, context=2):
    data = read_file(path)
    ok = True
    for key, values in data.items():
        bad = check_anomalies(values)
        if bad:
            ok = False
            print(f"{key}: {len(bad)} anomalous entries at {bad[:10]}...")
            for idx in bad[:3]:
                print(f"  context @{idx}: {find_data_at_index(data, idx, context)[key]}")
    if ok:
        print("sanity check passed: all entries numeric and finite")
    return ok


def average_every_step(values, window):
    values = np.asarray([v for v in values if isinstance(v, float)])
    n = len(values) // window * window
    if n == 0:
        return values
    return values[:n].reshape(-1, window).mean(axis=1)


def plot_data(path, window=100, out_path=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = read_file(path)
    psnr = average_every_step(data.get("psnr", []), window)
    loss = average_every_step(data.get("loss", []), window)
    fig, axes = plt.subplots(2, 1, figsize=(10, 8), sharex=True)
    x = np.arange(len(psnr)) * window
    axes[0].plot(x, psnr)
    axes[0].set_ylabel(f"PSNR (avg/{window})")
    axes[0].grid(True, alpha=0.3)
    axes[1].plot(np.arange(len(loss)) * window, loss, color="tab:red")
    axes[1].set_ylabel(f"loss (avg/{window})")
    axes[1].set_xlabel("iteration")
    axes[1].grid(True, alpha=0.3)
    if out_path is None:
        out_path = os.path.join(os.path.dirname(os.path.abspath(path)),
                                "result.png")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    print(f"saved {out_path}")
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="run dir or result.txt")
    ap.add_argument("--window", type=int, default=100)
    args = ap.parse_args()
    path = args.path
    if os.path.isdir(path):
        path = os.path.join(path, "result.txt")
    sanity_checker(path)
    plot_data(path, args.window)


if __name__ == "__main__":
    main()
