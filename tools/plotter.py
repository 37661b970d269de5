#!/usr/bin/env python3
"""Tracking-results plotter (reference plotter.py, C9).

Plots base x/y/z and quaternion tracking of results/q_optimal.csv against
data/q_standing.csv, prints mean/max/RMS errors per axis (the metrics
plotter.py:145-151 defines), and saves humanoid_tracking_comparison.png and
humanoid_tracking_errors.png.
"""
from __future__ import annotations

import argparse
import csv
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def load_q_optimal(path):
    with open(path) as f:
        rows = list(csv.reader(f))
    header = rows[0]
    cols = {c: i for i, c in enumerate(header)}
    data = np.atleast_2d(np.array([[float(v) for v in r] for r in rows[1:]]))
    if data.size == 0:
        raise SystemExit(f"{path} has no data rows — run the MPC first.")
    q_idx = [cols[c] for c in header if c.startswith("q_")]
    t = data[:, cols["time_sec"]] if "time_sec" in cols else np.arange(len(data)) * 0.02
    return t, data[:, q_idx]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="results/q_optimal.csv")
    ap.add_argument("--reference", default="data/q_standing.csv")
    ap.add_argument("--outdir", default="results")
    args = ap.parse_args()

    if not os.path.exists(args.results):
        print(f"Error: {args.results} not found. Run humanoid MPC first.")
        return
    t, q_act = load_q_optimal(args.results)
    q_ref = np.loadtxt(args.reference, delimiter=",")
    n = min(len(q_act), len(q_ref))
    t, q_act, q_ref = t[:n], q_act[:n], q_ref[:n]
    print(f"Loaded {n} steps (actual vs reference)")

    labels = ["X", "Y", "Z", "qw"]
    idxs = [0, 1, 2, 3]
    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    for ax, lab, i in zip(axes.ravel(), labels, idxs):
        ax.plot(t, q_act[:, i], label="actual")
        ax.plot(t, q_ref[:, i], "--", label="reference")
        ax.set_title(f"Base {lab} tracking")
        ax.set_xlabel("time [s]")
        ax.legend()
        ax.grid(alpha=0.3)
    fig.tight_layout()
    p1 = os.path.join(args.outdir, "humanoid_tracking_comparison.png")
    fig.savefig(p1, dpi=120)

    fig2, axes2 = plt.subplots(2, 2, figsize=(12, 8))
    print("\nTracking errors:")
    for ax, lab, i in zip(axes2.ravel(), labels, idxs):
        err = q_act[:, i] - q_ref[:, i]
        ax.plot(t, err)
        ax.set_title(f"Base {lab} error")
        ax.set_xlabel("time [s]")
        ax.grid(alpha=0.3)
        print(
            f"  {lab}: mean={np.mean(np.abs(err)):.6f}  max={np.max(np.abs(err)):.6f}  "
            f"rms={np.sqrt(np.mean(err**2)):.6f}"
        )
    fig2.tight_layout()
    p2 = os.path.join(args.outdir, "humanoid_tracking_errors.png")
    fig2.savefig(p2, dpi=120)
    print(f"\nSaved {p1} and {p2}")


if __name__ == "__main__":
    main()
