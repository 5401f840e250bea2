"""Scaling-corpus protocol invariants (bench.py): the per-replica cipher
must be a whitespace-preserving bijection so within-replica similarities are
exactly the original corpus's and cross-replica token sets are disjoint."""

import sys


def _bench():
    sys.path.insert(0, "/root/repo")
    import bench

    return bench


def test_cipher_table_is_whitespace_preserving_bijection():
    bench = _bench()
    assert bench._cipher_table(0) is None  # replica 0 = identity
    for i in (1, 5, 63):
        tbl = bench._cipher_table(i)
        assert len(tbl) == 256
        # bijection: the table is a permutation of 0..255
        assert sorted(tbl) == list(range(256))
        # identity outside printable non-space ASCII (incl. space, \t, \n)
        for b in list(range(0x21)) + list(range(0x7f, 256)):
            assert tbl[b] == b
        # non-identity somewhere inside the ciphered range
        assert any(tbl[b] != b for b in range(0x21, 0x7f))


def test_cipher_is_deterministic_and_replica_distinct():
    bench = _bench()
    assert bench._cipher_table(3) == bench._cipher_table(3)
    assert bench._cipher_table(3) != bench._cipher_table(4)


def test_cipher_preserves_token_structure_and_disjoins_replicas():
    bench = _bench()
    text = "spark sort batch group agg value"
    t1 = text.encode().translate(bench._cipher_table(1)).decode()
    t2 = text.encode().translate(bench._cipher_table(2)).decode()
    # token boundaries (whitespace) survive; token lengths survive
    assert [len(w) for w in t1.split(" ")] == [len(w) for w in text.split(" ")]
    # equal source tokens stay equal inside a replica (bijection on tokens)
    s = "aa bb aa".encode().translate(bench._cipher_table(1)).decode().split()
    assert s[0] == s[2] and s[0] != s[1]
    # replicas share no tokens with each other or the original
    assert not set(t1.split()) & set(t2.split())
    assert not set(t1.split()) & set(text.split())
