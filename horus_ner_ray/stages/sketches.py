"""Mergeable sketches: HyperLogLog count-distinct over a Dataset column.

Why a sketch in this engine: exact distinct counts (term vocabulary, unique
users, unique doc fingerprints) force either a shuffle (`groupby`/distinct)
or a driver-sized set.  At 100 TB a 16 KiB register array per stream that
merges with elementwise max answers the same question in one streaming
pass with bounded memory everywhere — the classic trade the reference
never needed at its scale but a corpus-scale engine does.

Algorithm: standard HyperLogLog (Flajolet et al. 2007) with the customary
corrections — linear counting below 2.5m registers-worth, no large-range
correction needed at 64-bit hash width.  Registers are uint8; partials are
one register array per batch, reduced driver-side by np.maximum (the merge
is associative/commutative/idempotent, so block order never matters).

Determinism: hashing is pd.util.hash_array (seeded, stable across runs and
layouts), so the ESTIMATE itself is a pure function of the value set —
tested as layout-invariant.  Accuracy ~1.04/sqrt(2^p) relative error.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from horus_ner_ray.util import worker_runtime_env as _rte


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (Steele et al., public domain
    constants) over an integer array — chosen as the oracle-friendly hash
    because the same three xorshift-multiply rounds are expressible in
    DuckDB SQL with HUGEINT split-multiply mod 2^64 (see _sql_hll_users
    in __ray_entry__.py), so the WHOLE HLL estimate becomes a pure,
    SQL-replicable function of the value set."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _registers_for_batch(vals: np.ndarray, p: int, hash64: str = "pandas") -> np.ndarray:
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(vals) == 0:
        return regs
    if hash64 == "splitmix64":
        if not np.issubdtype(vals.dtype, np.integer):
            raise TypeError("hash64='splitmix64' requires an integer column")
        h = splitmix64(vals)
    else:
        h = pd.util.hash_array(
            vals if vals.dtype != object else vals.astype(object), categorize=False
        ).astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad tail with 1s
    # rho = 1 + count of leading zeros in the remaining 64-p bits
    lz = np.zeros(len(rest), dtype=np.uint8)
    cur = rest
    # vectorized CLZ by binary halving over the 64-bit lane
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        cur = np.where(mask, cur << np.uint64(shift), cur)
    rho = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _estimate(regs: np.ndarray, p: int) -> float:
    """Register array -> estimate.  The harmonic sum sum(2^-rho) is
    computed EXACTLY in the integer domain, scaled by 2^rmax with
    rmax = 64-p+1 (the largest possible rho): a <=rmax+1-bin bincount +
    Python-int sum — order-free and replicable bit-for-bit by a SQL
    oracle (no float accumulation ordering anywhere in the estimate)."""
    m = 1 << p
    rmax = 64 - p + 1  # largest possible rho
    bins = np.bincount(regs, minlength=rmax + 1)
    s_int = sum(int(c) << (rmax - r) for r, c in enumerate(bins) if c)
    am = 0.7213 / (1 + 1.079 / m)
    k_num = am * m * m * float(1 << rmax)
    est = k_num / float(s_int)
    if est <= 2.5 * m:
        zeros = int(bins[0])
        if zeros:
            return m * np.log(m / zeros)  # linear counting
    return float(est)


def hll_registers(ds, col: str, p: int = 14, hash64: str = "pandas") -> np.ndarray:
    """One streaming pass -> merged register array (the mergeable state:
    persist it, union it across datasets with np.maximum)."""
    def part(batch: pa.Table) -> pa.Table:
        vals = np.asarray(batch[col])
        return pa.table({"regs": pa.array(
            [_registers_for_batch(vals, p, hash64).tolist()], pa.list_(pa.uint8()))})

    parts = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True,
                           runtime_env=_rte()).to_pandas()
    regs = np.zeros(1 << p, dtype=np.uint8)
    for r in parts["regs"]:
        np.maximum(regs, np.asarray(r, dtype=np.uint8), out=regs)
    return regs


def hll_count_distinct(ds, col: str, p: int = 14, hash64: str = "pandas") -> float:
    """Approximate COUNT(DISTINCT col); deterministic for a given value
    set, ~1.04/sqrt(2^p) relative error (p=14 -> ~0.8%).  With
    hash64='splitmix64' (integer columns) the estimate is additionally
    replicable in ANSI SQL — see the hll_users oracle."""
    return _estimate(hll_registers(ds, col, p, hash64), p)
