"""Page pool (native C++ and Python fallback) semantics."""

import numpy as np
import pytest

from quest_tpu.kv.pool import PagePool, _load_native


@pytest.fixture(params=["native", "python"])
def pool_kind(request):
    if request.param == "native" and _load_native() is None:
        pytest.skip("native lib unavailable")
    return request.param == "native"


def test_alloc_extend_release(pool_kind):
    p = PagePool(total_pages=10, page_size=4, max_seqs=3,
                 native=pool_kind or None)
    if pool_kind:
        assert p.is_native
    a = p.seq_create()
    b = p.seq_create()
    assert p.seq_extend(a, 5) == 2          # 5 tokens -> 2 pages
    assert p.seq_extend(a, 3) == 0          # fills page 2 exactly
    assert p.seq_extend(a, 1) == 1          # opens page 3
    assert p.seq_len(a) == 9
    assert p.seq_extend(b, 17) == 5
    assert p.free_pages() == 10 - 3 - 5
    pages_a = p.seq_pages(a)
    pages_b = p.seq_pages(b)
    assert len(set(pages_a) & set(pages_b)) == 0, "no page sharing"
    p.seq_release(a)
    assert p.free_pages() == 10 - 5
    c = p.seq_create()
    assert p.seq_extend(c, 12) == 3          # reuses released pages
    assert len(set(p.seq_pages(c)) & set(pages_b)) == 0


def test_exhaustion_and_tables(pool_kind):
    p = PagePool(total_pages=4, page_size=2, max_seqs=2,
                 native=pool_kind or None)
    a = p.seq_create()
    p.seq_extend(a, 8)                       # all 4 pages
    with pytest.raises(MemoryError):
        p.seq_extend(a, 1)
    tables, lens = p.fill_batch_tables([a], table_width=6, pad_page=-1)
    assert lens.tolist() == [8]
    assert sorted(tables[0, :4].tolist()) == [0, 1, 2, 3]
    assert tables[0, 4:].tolist() == [-1, -1]


def test_batch_tables_multi(pool_kind):
    p = PagePool(total_pages=64, page_size=4, max_seqs=8,
                 native=pool_kind or None)
    ids = [p.seq_create() for _ in range(4)]
    for i, sid in enumerate(ids):
        p.seq_extend(sid, 3 + 4 * i)
    tables, lens = p.fill_batch_tables(ids, table_width=8)
    assert lens.tolist() == [3, 7, 11, 15]
    seen = set()
    for i, sid in enumerate(ids):
        n = (lens[i] + 3) // 4
        row = set(tables[i, :n].tolist())
        assert not (row & seen)
        seen |= row


def test_native_matches_python_behaviour():
    if _load_native() is None:
        pytest.skip("native lib unavailable")
    pn = PagePool(32, 4, 4, native=True)
    pp = PagePool(32, 4, 4, native=False)
    import random
    rnd = random.Random(0)
    seqs_n, seqs_p = {}, {}
    for step in range(200):
        op = rnd.random()
        if op < 0.3 and len(seqs_n) < 4:
            a, b = pn.seq_create(), pp.seq_create()
            seqs_n[a] = b
        elif op < 0.5 and seqs_n:
            a = rnd.choice(list(seqs_n))
            pn.seq_release(a)
            pp.seq_release(seqs_n.pop(a))
        elif seqs_n:
            a = rnd.choice(list(seqs_n))
            t = rnd.randint(1, 9)
            try:
                rn = pn.seq_extend(a, t)
            except MemoryError:
                rn = "oom"
            try:
                rp = pp.seq_extend(seqs_n[a], t)
            except MemoryError:
                rp = "oom"
            assert rn == rp
            if rn != "oom":
                assert pn.seq_len(a) == pp.seq_len(seqs_n[a])
        assert pn.free_pages() == pp.free_pages()


def test_page_refcounts_survive_owner_release(pool_kind):
    """pages_retain holds keep pages allocated after the owning
    sequence releases (the prefix-cache contract)."""
    pool = PagePool(total_pages=8, page_size=4, max_seqs=4,
                    native=pool_kind or None)
    sid = pool.seq_create()
    pool.seq_extend(sid, 16)           # 4 pages
    pages = pool.seq_pages(sid)
    shared = pages[:2]
    pool.pages_retain(shared)          # registry hold
    pool.pages_retain(shared)          # borrower hold
    pool.seq_release(sid)
    # 2 unshared pages returned; 2 shared pages still held.
    assert pool.free_pages() == 6
    # New allocations never hand out the held pages.
    sid2 = pool.seq_create()
    pool.seq_extend(sid2, 24)          # 6 pages = everything free
    assert set(pool.seq_pages(sid2)).isdisjoint(shared)
    pool.pages_release(shared)
    assert pool.free_pages() == 0
    pool.pages_release(shared)
    assert pool.free_pages() == 2
    with pytest.raises(ValueError):
        pool.pages_release(shared)     # over-release is rejected
    pool.seq_release(sid2)
    assert pool.free_pages() == 8
