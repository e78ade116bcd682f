"""Seeded randomized differential fuzz over the r14 frame-alignment
machinery: random (dtype, index-shape) frame pairs through the dunder
and named op surface, engine vs pandas, equal values or equal exception
class.

Exclusions (ledgered): bool columns never carry None (pandas turns the
column object-dtype and runs python-level arithmetic — documented
deviation in test_r14_frame_arith.py); dunder comparisons are skipped
(the identically-labeled raise is lazy in-plan, so the exception TYPE
deviates by design); // % ** against zero-heavy int divisors are
exercised via the float pools.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

from pontem_spark.core import DataFrame as PFrame

NAN = float("nan")

INDEX_POOL = [
    [1, 2, 3, 4],            # monotonic unique
    [4, 1, 3, 2],            # non-monotonic unique
    [1, 1, 2, 3],            # duplicate labels
    [10, 20, 30, 40],        # disjoint-ish
    [2, 3, 4, 5],            # overlapping shift
]


def _rand_col(rng, dtype):
    if dtype == "float":
        vals = [round(rng.uniform(-50, 50), 2) for _ in range(4)]
        if rng.random() < 0.5:
            vals[rng.randrange(4)] = NAN
        return vals
    if dtype == "int":
        # POSITIVE ints only: pandas int64 zero-division and negative-
        # exponent rules depend on whether alignment holes flipped the
        # column to float64 — column-wide action at a distance the engine
        # reproduces only where hole-freedom is provable (same-anchor).
        # Negative/zero int edges are pinned in test_r14_frame_arith.py
        # on the same-anchor and scalar paths. Capped at 9 so int ** int
        # stays inside int64 — pandas WRAPS on overflow (the documented
        # int64-wrap non-oracle), the engine computes the real value.
        return [rng.randint(1, 9) for _ in range(4)]
    if dtype == "bool":
        return [rng.random() < 0.5 for _ in range(4)]
    return [rng.choice(["a", "bb", "ccc", "d"]) for _ in range(4)]


# dtype is keyed by COLUMN NAME so two random frames agree per shared
# column: pandas object-evals mixed bool-vs-numeric cross-frame cells
# (python ZeroDivisionError on /0 etc) — a ledgered deviation (the
# engine upcasts bool -> int uniformly, like pandas scalar ops do), so
# the fuzz never collides a bool column with a numeric one.
_NAME_DTYPE = {"x": "float", "y": "int", "z": "bool", "s": "str", "w": "float"}


def _rand_frame(rng, allow_str=False, allow_bool=True):
    pool = ["x", "y", "w"] + (["z"] if allow_bool else []) + (["s"] if allow_str else [])
    names = rng.sample(pool, rng.randint(1, 3))
    data = {n: _rand_col(rng, _NAME_DTYPE[n]) for n in sorted(names)}
    idx = rng.choice(INDEX_POOL)
    return data, idx


def _run(spark, fn_pd, fn_en, label):
    try:
        want, perr = fn_pd(), None
    except Exception as e:  # noqa: BLE001
        want, perr = None, e
    try:
        got, eerr = fn_en().to_pandas(), None
    except Exception as e:  # noqa: BLE001
        got, eerr = None, e
    if perr is not None or eerr is not None:
        # the engine's value-dependent raises are lazy in-plan
        # (raise_error), surfacing as Spark's USER_RAISED_EXCEPTION — a
        # ledgered TYPE deviation; the message carries pandas' text
        if perr is not None and eerr is not None and "USER_RAISED" in str(eerr):
            return
        same_kind = (
            perr is not None
            and eerr is not None
            and (
                type(perr).__name__ == type(eerr).__name__
                or isinstance(perr, type(eerr))
                or isinstance(eerr, type(perr))
            )
        )
        assert same_kind, (
            label,
            f"pandas={type(perr).__name__ if perr else 'OK'}: {perr}",
            f"engine={type(eerr).__name__ if eerr else 'OK'}: {eerr}",
        )
        return
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-12,
        obj=label,
    )


DUNDERS = ["add", "sub", "mul", "truediv", "floordiv", "mod", "pow"]


@pytest.mark.parametrize("seed", range(14, 26))
def test_fuzz_frame_frame_arith(spark, seed):
    rng = random.Random(seed)
    for case in range(3):
        d1, i1 = _rand_frame(rng)
        d2, i2 = _rand_frame(rng)
        if rng.random() < 0.4 or "z" in d1 or "z" in d2:
            # identical sequences: the positional path under dups; also
            # forced whenever a bool column exists — alignment-introduced
            # NaN flips pandas bool columns to OBJECT dtype and python
            # cell-eval (False+False == 0, x/False raises
            # ZeroDivisionError), a ledgered deviation
            i2 = i1
        opname = rng.choice(DUNDERS)
        import operator

        op = getattr(operator, opname)
        label = f"seed={seed} case={case} op={opname} d1={d1} i1={i1} d2={d2} i2={i2}"
        _run(
            spark,
            lambda: op(pd.DataFrame(d1, index=i1), pd.DataFrame(d2, index=i2)),
            lambda: op(PFrame(d1, index=i1, spark=spark), PFrame(d2, index=i2, spark=spark)),
            label,
        )


@pytest.mark.parametrize("seed", range(40, 48))
def test_fuzz_named_fill_value(spark, seed):
    rng = random.Random(seed)
    for case in range(2):
        d1, i1 = _rand_frame(rng, allow_bool=False)
        d2, i2 = _rand_frame(rng, allow_bool=False)
        name = rng.choice(["add", "sub", "mul", "div", "floordiv", "mod", "pow"])
        fv = rng.choice([0, 1, 2.5])
        label = f"seed={seed} case={case} op={name} fv={fv} d1={d1} i1={i1} d2={d2} i2={i2}"
        _run(
            spark,
            lambda: getattr(pd.DataFrame(d1, index=i1), name)(pd.DataFrame(d2, index=i2), fill_value=fv),
            lambda: getattr(PFrame(d1, index=i1, spark=spark), name)(PFrame(d2, index=i2, spark=spark), fill_value=fv),
            label,
        )


@pytest.mark.parametrize("seed", range(70, 78))
def test_fuzz_named_comparisons_align(spark, seed):
    rng = random.Random(seed)
    for case in range(2):
        d1, i1 = _rand_frame(rng)
        d2, i2 = _rand_frame(rng)
        name = rng.choice(["eq", "ne", "lt", "le", "gt", "ge"])
        label = f"seed={seed} case={case} op={name} d1={d1} i1={i1} d2={d2} i2={i2}"
        _run(
            spark,
            lambda: getattr(pd.DataFrame(d1, index=i1), name)(pd.DataFrame(d2, index=i2)),
            lambda: getattr(PFrame(d1, index=i1, spark=spark), name)(PFrame(d2, index=i2, spark=spark)),
            label,
        )


@pytest.mark.parametrize("seed", range(90, 98))
def test_fuzz_scalar_and_string_ops(spark, seed):
    rng = random.Random(seed)
    import operator

    for case in range(3):
        d1, i1 = _rand_frame(rng, allow_str=True)
        kind = rng.random()
        if kind < 0.5:
            other = rng.choice([2, -3, 0, 2.5, True, "q"])
            opname = rng.choice(DUNDERS)
            op = getattr(operator, opname)
            label = f"seed={seed} case={case} op={opname} other={other!r} d1={d1} i1={i1}"
            _run(
                spark,
                lambda: op(pd.DataFrame(d1, index=i1), other),
                lambda: op(PFrame(d1, index=i1, spark=spark), other),
                label,
            )
        else:
            d2, i2 = _rand_frame(rng, allow_str=True)
            if "z" in d1 or "z" in d2:
                i2 = i1  # bool + misalignment = pandas object-land (ledgered)
            label = f"seed={seed} case={case} op=add-str d1={d1} i1={i1} d2={d2} i2={i2}"
            _run(
                spark,
                lambda: pd.DataFrame(d1, index=i1) + pd.DataFrame(d2, index=i2),
                lambda: PFrame(d1, index=i1, spark=spark) + PFrame(d2, index=i2, spark=spark),
                label,
            )
