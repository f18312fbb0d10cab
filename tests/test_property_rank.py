"""Property-based check of the two-phase rank law (hypothesis).

The round-9 rewrites (x75/x78/x81/x99/x121/b40) all rest on one claim:
for ANY dataset and ANY cell function that is MONOTONE in the sort key,

    global_rank(row) = (# rows in strictly-earlier cells)
                     + (rank of row within its own cell)

equals the rank from one global sort — and NTILE(k) applied to that
exact rank (base = n DIV k, first n % k buckets take one extra row)
equals SQL NTILE. Hypothesis drives randomized datasets (duplicates,
negatives, all-equal degenerate runs) against pure-Python reference
models: the same math the Spark plans execute via within-cell windows +
broadcast histogram offsets, with no Spark in the loop so the LAW is
what's tested, not the engine.
"""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

_values = st.lists(
    st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=200
)

#: Monotone cell functions exercised by the shipped plans: the identity
#: (x75's value histogram), a fixed-width grid (x121/b40), the binary
#: magnitude (x78), and a constant (the degenerate one-cell collapse).
_CELL_FNS = [
    lambda v: v,
    lambda v: v // 64,
    lambda v: max(v, 0).bit_length(),
    lambda v: 0,
]


def _two_phase_ranks(rows, cell):
    """rows = [(value, id)] -> {id: rank} via the two-phase law."""
    cells = {}
    for v, i in rows:
        cells.setdefault(cell(v), []).append((v, i))
    offsets = {}
    acc = 0
    for c in sorted(cells):
        offsets[c] = acc
        acc += len(cells[c])
    out = {}
    for c, members in cells.items():
        for rn, (v, i) in enumerate(sorted(members), start=1):
            out[i] = offsets[c] + rn
    return out


@given(vals=_values, cell_idx=st.integers(min_value=0, max_value=3))
def test_two_phase_rank_equals_global_sort_rank(vals, cell_idx):
    rows = [(v, i) for i, v in enumerate(vals)]
    cell = _CELL_FNS[cell_idx]
    got = _two_phase_ranks(rows, cell)
    want = {i: rn for rn, (v, i) in enumerate(sorted(rows), start=1)}
    assert got == want


@given(
    n=st.integers(min_value=1, max_value=500),
    k=st.integers(min_value=1, max_value=10),
)
def test_ntile_arithmetic_matches_sql_ntile(n, k):
    """The CASE law against the SQL definition: bucket sizes differ by
    at most one, earlier buckets take the extras, ranks map in order."""
    base, rem = divmod(n, k)
    # reference: materialize the bucket of every rank per SQL NTILE
    want, r = [], 0
    for b in range(1, k + 1):
        size = base + (1 if b <= rem else 0)
        want.extend([b] * size)
    got = []
    for r in range(1, n + 1):
        if r <= rem * (base + 1):
            got.append((r - 1) // (base + 1) + 1)
        else:
            got.append(rem + (r - rem * (base + 1) - 1) // base + 1)
    assert got == want[:n]


@given(vals=_values)
def test_monotone_cells_never_split_a_rank_run(vals):
    """The property the cell functions must satisfy for the law to hold:
    v1 <= v2 implies cell(v1) <= cell(v2) — checked for every shipped
    cell function over random value pairs (the binary-magnitude form is
    the subtle one: bin() length is monotone only for non-negatives,
    which x78 guarantees by construction; the clamp here mirrors it)."""
    svals = sorted(vals)
    for cell in _CELL_FNS:
        cells = [cell(v) for v in svals]
        assert all(a <= b for a, b in zip(cells, cells[1:]))


# ---------------------------------------------------------------------------
# Round-10: the map-only argmin law (_kmeans_assign's array_max rewrite)
# ---------------------------------------------------------------------------

_cosines = st.lists(
    st.floats(
        min_value=-1.0, max_value=1.0, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=50,
)


@given(cos=_cosines)
def test_array_max_ordering_struct_equals_window_argmin(cos):
    """The round-10 argmin rewrite rests on one claim: for any cosine list
    with DISTINCT centroid ids,

        max over (c_cos, -cid)  ==  first row of ORDER BY c_cos DESC, cid ASC

    i.e. the lexicographic max of the ordering struct picks exactly the
    row the replaced row_number()==1 window picked, including exact float
    ties (duplicated cosines resolve to the LOWEST cid). Pure-Python
    model, Spark-free — the struct-comparison semantics themselves are
    pinned by tests/test_llm_semantics.py::test_kmeans_assign_tiebreak_
    is_lowest_cid; duplicates are exercised by doubling the list."""
    rows = [(c, i) for i, c in enumerate(cos)] + [
        (c, len(cos) + i) for i, c in enumerate(cos)  # force exact ties
    ]
    via_max = max(rows, key=lambda r: (r[0], -r[1]))
    via_window = sorted(rows, key=lambda r: (-r[0], r[1]))[0]
    assert via_max == via_window
