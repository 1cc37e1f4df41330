"""Property-based differential for the banded sign-LSH blocking
(functions/banded_lsh.py) at RANDOM (bits, bands) — the declared keys
pin (4, 8) and the auto tier walks an integer ladder over the same
machinery, so the general contract (pairs = EXACTLY the same-label
pairs agreeing on ≥1 band with exact cosine ≥ τ — no fabrication, no
candidate lost to the dedup/verify plumbing) ships untested off those
two operating points. The referee recomputes band keys and scores in
pure Python on the same rows.

Vector components are multiples of 0.5 so every dot product is an
exact multiple of 0.25 — the 6dp rounding is the identity and the
comparison is equality, not tolerance."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from zonal_datacube_spark.functions.banded_lsh import banded_cosine_join

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

DIM = 12


@st.composite
def lsh_case(draw):
    bits = draw(st.integers(2, 4))
    bands = draw(st.integers(1, DIM // bits))
    n = draw(st.integers(6, 18))
    comp = st.sampled_from([-1.0, -0.5, 0.5, 1.0])
    rows = [
        (
            i,
            draw(st.integers(0, 1)),  # 2 labels
            [draw(comp) for _ in range(DIM)],
        )
        for i in range(n)
    ]
    tau = draw(st.sampled_from([-2.0, 0.0, 1.5]))  # below/at/above typical dots
    return bits, bands, rows, tau


def _band_keys(vec, bits, bands):
    return tuple(
        sum((1 << i) for i in range(bits) if vec[k * bits + i] > 0)
        for k in range(bands)
    )


@given(case=lsh_case())
@SETTINGS
def test_banded_join_equals_bruteforce_band_predicate(case, spark):
    bits, bands, rows, tau = case
    emb = spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<double>"
    )
    got = {
        (r.label, r.a_id, r.b_id, r.score)
        for r in banded_cosine_join(emb, tau, bits, bands).collect()
    }
    want = set()
    for i, (ai, al, av) in enumerate(rows):
        ka = _band_keys(av, bits, bands)
        for bi, bl, bv in rows[i + 1 :]:
            if al != bl:
                continue
            kb = _band_keys(bv, bits, bands)
            if not any(x == y for x, y in zip(ka, kb)):
                continue
            score = sum(x * y for x, y in zip(av, bv))  # exact ×0.25 grid
            if score >= tau:
                lo, hi = min(ai, bi), max(ai, bi)
                want.add((al, lo, hi, score))
    assert got == want
