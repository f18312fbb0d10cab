"""The ONE from-the-spec SimHash reference recompute shared by the test
modules (round-12 advice: two independent inline copies of the vote /
threshold spec could silently diverge on a future tie-handling change).

Spec: token hash = the first ``prefix_hex`` hex chars of sha256(token)
as an integer; for each bit b in [0, nbits), vote +1/-1 over the token
hashes' bit b; bit set iff the vote sum is strictly positive. Matches
``operators/llm.py::_simhash`` with ``hash16`` (nbits=16, prefix_hex=4)
or ``hash32`` (nbits=32, prefix_hex=8).
"""

from __future__ import annotations

import hashlib


def simhash_ref(tokens: list[str], nbits: int, prefix_hex: int) -> int:
    sig = 0
    for b in range(nbits):
        vote = 0
        for t in tokens:
            h = int(hashlib.sha256(t.encode()).hexdigest()[:prefix_hex], 16)
            vote += 1 if (h >> b) & 1 else -1
        if vote > 0:
            sig |= 1 << b
    return sig
