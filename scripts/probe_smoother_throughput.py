"""Measure the Python-side throughput of the Holt / Holt-Winters batch
kernels (r4 verdict task 4): per-row scalar loop vs the round-5
segment-vectorized form, on one synthetic sorted Arrow-sized batch —
pure pandas/numpy, no Spark, so the number is the per-core bound the
mapInPandas stage sees after Arrow transfer.

The scalar reference loops here are verbatim copies of the round-4
implementations (operators/timeseries.py @ b59edbd) and double as the
bitwise-parity oracle for the vectorized kernels.

Usage: python scripts/probe_smoother_throughput.py [n_keys] [steps]
"""

from __future__ import annotations

import sys
import time
from collections import deque

import numpy as np
import pandas as pd

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from usedcars_bigdata_spark.operators.timeseries import (  # noqa: E402
    holt_trend,  # noqa: F401  (import proves the module loads)
)


def make_batch(n_keys: int, steps: int) -> pd.DataFrame:
    rng = np.random.RandomState(7)
    keys = np.repeat([f"k{i:06d}" for i in range(n_keys)], steps)
    x = rng.uniform(0, 100, n_keys * steps)
    return pd.DataFrame({"k": keys, "x": x})


def scalar_holt(pdf, alpha=0.5, beta=0.5):
    keys = pdf["k"].to_numpy()
    x = pdf["x"].to_numpy(dtype="float64")
    n = len(x)
    level = np.empty(n)
    trend = np.empty(n)
    carry = {}
    for i in range(n):
        k = keys[i]
        st = carry.get(k)
        if st is None:
            lv, tr = x[i], 0.0
        else:
            plv, tr = st
            lv = alpha * x[i] + (1 - alpha) * (plv + tr)
            tr = beta * (lv - plv) + (1 - beta) * tr
        level[i], trend[i] = lv, tr
        carry[k] = (lv, tr)
    return level, trend


def vector_holt(pdf, alpha=0.5, beta=0.5):
    keys = pdf["k"].to_numpy()
    x = pdf["x"].to_numpy(dtype="float64")
    n = len(x)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = keys[1:] != keys[:-1]
    first_idx = np.flatnonzero(change)
    counts = np.diff(np.append(first_idx, n))
    n_k = len(first_idx)
    lv = np.zeros(n_k)
    tr = np.zeros(n_k)
    level = np.empty(n)
    trend = np.empty(n)
    for t in range(int(counts.max())):
        act = np.flatnonzero(counts > t)
        ridx = first_idx[act] + t
        xt = x[ridx]
        lv_a = lv[act]
        new_lv = alpha * xt + (1 - alpha) * (lv_a + tr[act])
        new_tr = beta * (new_lv - lv_a) + (1 - beta) * tr[act]
        if t == 0:
            new_lv = xt  # all keys fresh in this probe
            new_tr = np.zeros_like(xt)
        lv[act] = new_lv
        tr[act] = new_tr
        level[ridx] = new_lv
        trend[ridx] = new_tr
    return level, trend


def scalar_hw(pdf, season=24, alpha=0.5, beta=0.5, gamma=0.5):
    keys = pdf["k"].to_numpy()
    x = pdf["x"].to_numpy(dtype="float64")
    n = len(x)
    level = np.empty(n)
    trend = np.empty(n)
    seas = np.empty(n)
    carry = {}
    for i in range(n):
        k = keys[i]
        st = carry.get(k)
        if st is None:
            lv, tr, r = x[i], 0.0, 1
            hist = deque(maxlen=season)
            s_used = 0.0
        else:
            lv, tr, r, hist = st
            r += 1
            s_used = hist[0] if r > season else 0.0
            new_lv = alpha * (x[i] - s_used) + (1 - alpha) * (lv + tr)
            tr = beta * (new_lv - lv) + (1 - beta) * tr
            lv = new_lv
        s_new = gamma * (x[i] - lv) + (1 - gamma) * s_used
        hist.append(s_new)
        level[i], trend[i], seas[i] = lv, tr, s_new
        carry[k] = [lv, tr, r, hist]
    return level, trend, seas


def vector_hw(pdf, season=24, alpha=0.5, beta=0.5, gamma=0.5):
    keys = pdf["k"].to_numpy()
    x = pdf["x"].to_numpy(dtype="float64")
    n = len(x)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = keys[1:] != keys[:-1]
    first_idx = np.flatnonzero(change)
    counts = np.diff(np.append(first_idx, n))
    n_k = len(first_idx)
    lv = np.zeros(n_k)
    tr = np.zeros(n_k)
    ring = np.zeros((n_k, season))
    level = np.empty(n)
    trend = np.empty(n)
    seas = np.empty(n)
    for t in range(int(counts.max())):
        act = np.flatnonzero(counts > t)
        ridx = first_idx[act] + t
        xt = x[ridx]
        r_now = t + 1  # all keys fresh in this probe
        p = (r_now - 1) % season
        s_used = ring[act, p] if r_now > season else np.zeros_like(xt)
        lv_a = lv[act]
        new_lv = alpha * (xt - s_used) + (1 - alpha) * (lv_a + tr[act])
        new_tr = beta * (new_lv - lv_a) + (1 - beta) * tr[act]
        if t == 0:
            new_lv = xt
            new_tr = np.zeros_like(xt)
        s_new = gamma * (xt - new_lv) + (1 - gamma) * s_used
        lv[act] = new_lv
        tr[act] = new_tr
        ring[act, p] = s_new
        level[ridx] = new_lv
        trend[ridx] = new_tr
        seas[ridx] = s_new
    return level, trend, seas


def bench(fn, pdf, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(pdf)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    pdf = make_batch(n_keys, steps)
    n = len(pdf)
    print(f"batch: {n_keys} keys x {steps} steps = {n} rows")

    ts, so = bench(scalar_holt, pdf)
    tv, vo = bench(vector_holt, pdf)
    assert all(np.array_equal(a, b) for a, b in zip(so, vo)), "holt parity"
    print(f"holt      scalar {n/ts/1e6:7.2f} M rows/s   vector {n/tv/1e6:7.2f} M rows/s   speedup {ts/tv:5.1f}x  (bitwise equal)")

    ts, so = bench(scalar_hw, pdf)
    tv, vo = bench(vector_hw, pdf)
    assert all(np.array_equal(a, b) for a, b in zip(so, vo)), "hw parity"
    print(f"holt-wint scalar {n/ts/1e6:7.2f} M rows/s   vector {n/tv/1e6:7.2f} M rows/s   speedup {ts/tv:5.1f}x  (bitwise equal)")


if __name__ == "__main__":
    main()
