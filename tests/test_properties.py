"""Property-based invariants (hypothesis) for the curation operators.

Each property is the class-level statement behind a fixed-case test
elsewhere: random tiny corpora instead of hand-planted ones.  Example
counts are kept small — every example drives a real Spark job."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from simhash_text_dedup_spark.operators.dupspans import strip_dup_spans
from simhash_text_dedup_spark.operators.packing import pack_sequences

# tiny vocabulary => dense cross-document gram collisions
_WORD = st.sampled_from(list("abcdef"))
_DOC = st.lists(_WORD, min_size=3, max_size=14).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=2, max_size=6)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(texts=_CORPUS)
@settings(**_SETTINGS)
def test_strip_every_dup_gram_survives_somewhere(spark, texts):
    """The survival guarantee: any word 3-gram occurring in >= 2 docs
    must still occur, contiguously, in at least one stripped output
    (its owner protects the covered positions)."""
    width = 3
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = {r.doc_id: r for r in
           strip_dup_spans(docs, width=width, min_docs=2).collect()}

    def grams(text):
        toks = text.split(" ")
        return [" ".join(toks[i:i + width])
                for i in range(len(toks) - width + 1)]

    by_gram = {}
    for i, t in enumerate(texts):
        for g in set(grams(t)):
            by_gram.setdefault(g, []).append(i)
    for g, members in by_gram.items():
        if len(members) < 2:
            continue
        survivors = [i for i in members if g in grams(out[i].stripped_text)]
        assert survivors, (g, members, {i: out[i].stripped_text for i in members})
        # the owner (min doc_id) specifically keeps its copy
        assert min(members) in survivors

    # bookkeeping: n_removed consistent with the reassembled text
    for i, t in enumerate(texts):
        kept = len(out[i].stripped_text.split(" ")) if out[i].stripped_text else 0
        assert out[i].n_words - out[i].n_removed == kept


@given(
    texts=st.lists(
        st.lists(_WORD, min_size=0, max_size=9).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    seq_len=st.integers(min_value=2, max_value=7),
)
@settings(**_SETTINGS)
def test_packing_offsets_partition_each_shard(spark, texts, seq_len):
    """Within every shard the document intervals tile [0, total tokens)
    with no gap or overlap, and sequence indices are the interval's
    integer-division image."""
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = pack_sequences(docs, seq_len=seq_len, n_shards=3).collect()
    shards = {}
    for r in rows:
        shards.setdefault(r.shard, []).append(r)
    assert sum(len(v) for v in shards.values()) == len(texts)
    for members in shards.values():
        members.sort(key=lambda r: r.token_offset)
        cum = 0
        for r in members:
            assert r.token_offset == cum
            cum += r.n_tokens
            assert r.first_seq == r.token_offset // seq_len
            last_token = max(r.token_offset, r.token_offset + r.n_tokens - 1)
            assert r.last_seq == last_token // seq_len
