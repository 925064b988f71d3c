"""Property-based round-trip for the native Lance v2 writer/reader:
for ANY table over the supported type surface — random values, null
patterns, unicode, empty strings/blobs, varying row counts —
write_dataset → read_dataset must be bit-exact.

Complements the fixture-based byte-identity test (which pins the
exact reference layout) by sweeping the VALUE space; hypothesis
shrinks any failure to a minimal counterexample.
"""

from __future__ import annotations

import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lance_duckdb_spark.sources import lance_native as ln
from lance_duckdb_spark.sources import lance_native_write as lw

_N = st.shared(st.integers(min_value=1, max_value=40), key="nrows")


def _col(values, typ):
    return st.lists(
        st.one_of(st.none(), values), min_size=1, max_size=40
    ).map(lambda v: (v, typ))


_f32 = st.floats(
    width=32, allow_nan=False, allow_infinity=False
).map(float)
_f64 = st.floats(allow_nan=False, allow_infinity=False)

_COLUMNS = {
    "i32": _col(st.integers(-(2**31), 2**31 - 1), pa.int32()),
    "i64": _col(st.integers(-(2**63), 2**63 - 1), pa.int64()),
    "f32": _col(_f32, pa.float32()),
    "f64": _col(_f64, pa.float64()),
    "s": _col(st.text(max_size=12), pa.string()),
    "b": _col(st.binary(max_size=12), pa.binary()),
    "bo": _col(st.booleans(), pa.bool_()),
    "dt": _col(st.integers(-100_000, 100_000), pa.date32()),
    "ts": _col(
        st.integers(-(2**60), 2**60), pa.timestamp("us")
    ),
}


@st.composite
def tables(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    names = draw(
        st.lists(
            st.sampled_from(sorted(_COLUMNS)),
            min_size=1,
            max_size=5,
            unique=True,
        )
    )
    cols = {}
    for name in names:
        vals, typ = draw(_COLUMNS[name])
        vals = (vals * (n // len(vals) + 1))[:n]
        if typ in (pa.date32(), pa.timestamp("us")):
            base = pa.array(
                vals, pa.int32() if typ == pa.date32() else pa.int64()
            )
            cols[name] = base.cast(typ)
        else:
            cols[name] = pa.array(vals, typ)
    # optional fixed-size-list embedding column (never null rows —
    # matches the writer's FSL contract)
    if draw(st.booleans()):
        dim = draw(st.integers(min_value=1, max_value=4))
        emb = draw(
            st.lists(
                st.lists(_f32, min_size=dim, max_size=dim),
                min_size=1,
                max_size=40,
            )
        )
        emb = (emb * (n // len(emb) + 1))[:n]
        cols["emb"] = pa.array(emb, pa.list_(pa.float32(), dim))
    return pa.table(cols)


@given(t=tables())
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_native_roundtrip_bit_exact(t, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("prop") / "ds.lance")
    lw.write_dataset(t, root)
    back = ln.read_dataset(root)
    assert back.equals(t), f"mismatch for schema {t.schema}"


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_blas_prefilter_equals_pure_sequential_fold(nx, nc, seed):
    """The two-phase pair scan (BLAS prefilter at a 1e-6 relative
    margin + exact sequential fold on survivors) must select EXACTLY
    the pairs the pure fold selects, with bit-identical cosines —
    the losslessness claim in operators/similarity.py's score()."""
    import numpy as np

    rng = np.random.RandomState(seed)
    dim = 64
    X = rng.standard_normal((nx, dim)) * rng.uniform(0.1, 3.0)
    C = rng.standard_normal((nc, dim)) * rng.uniform(0.1, 3.0)
    # inject near-threshold pairs: make some C rows correlated with X
    for i in range(min(nx, nc)):
        if rng.rand() < 0.5:
            C[i] = X[i % nx] * 0.31 + rng.standard_normal(dim) * 0.72

    def seq_norms(M):
        acc = np.zeros(M.shape[0])
        for i in range(M.shape[1]):
            acc += M[:, i] * M[:, i]
        return np.sqrt(acc)

    T = 0.4
    xn, cn = seq_norms(X), seq_norms(C)

    # pure fold over every pair
    dot = np.zeros((nx, nc))
    for i in range(dim):
        dot += X[:, i, None] * C[None, :, i]
    cos_full = np.clip(dot / (xn[:, None] * cn[None, :]), -1.0, 1.0)
    want = {
        (a, b): cos_full[a, b]
        for a, b in zip(*np.nonzero(cos_full >= T))
    }

    # two-phase
    approx = X @ C.T
    ai, bi = np.nonzero(approx >= (T - 1e-6) * (xn[:, None] * cn[None, :]))
    acc = np.zeros(len(ai))
    A, B = X[ai], C[bi]
    for i in range(dim):
        acc += A[:, i] * B[:, i]
    cos = np.clip(acc / (xn[ai] * cn[bi]), -1.0, 1.0)
    keep = cos >= T
    got = {
        (a, b): c for a, b, c in zip(ai[keep], bi[keep], cos[keep])
    }
    assert got == want  # identical pair set AND bit-identical values
