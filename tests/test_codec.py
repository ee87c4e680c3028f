"""Posting-list codec round-trip property tests."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_prepper_spark.index.codec import (
    decode_block_docs,
    decode_many,
    encode_block_docs,
    to_signed,
    varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(v)), v)


@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=300,
        unique=True,
    )
)
@settings(max_examples=200, deadline=None)
def test_block_docs_roundtrip(ids):
    a = np.array(sorted(ids), dtype=np.int64)
    assert np.array_equal(decode_block_docs(encode_block_docs(a)), a)


def test_decode_many_batched():
    rng = np.random.default_rng(7)
    bufs, expect = [], []
    for _ in range(64):
        n = int(rng.integers(0, 200))
        ids = (
            np.unique(rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64))
            if n
            else np.empty(0, np.int64)
        )
        bufs.append(encode_block_docs(ids) if len(ids) else b"")
        expect.append(ids)
    vals, counts = decode_many(bufs, deltas=True)
    got = np.split(to_signed(vals), np.cumsum(counts)[:-1])
    for e, g in zip(expect, got):
        assert np.array_equal(e, g)


def test_boundary_values():
    for v in [0, 127, 128, 2**14 - 1, 2**14, 2**63, 2**64 - 1]:
        a = np.array([v], dtype=np.uint64)
        assert varbyte_decode(varbyte_encode(a))[0] == v
