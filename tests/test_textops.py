"""Training-data pipeline operators: dedup, similarity, text analysis."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geotrellis_landsat_emr_demo_spark.operators import similarity, textops

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    # small doc corpus with planted exact + near duplicates
    base = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    rows = base.collect()
    extra = [
        # exact dup of doc 0 (id 9001), near-dup of doc 1 (id 9002)
        dict(doc_id=9001, text=rows[0].text, lang=rows[0].lang, source="dup", n_chars=rows[0].n_chars),
        dict(doc_id=9002, text=rows[1].text + " extra tail word", lang=rows[1].lang, source="dup", n_chars=rows[1].n_chars + 16),
    ]
    return base.unionByName(spark.createDataFrame(pd.DataFrame(extra)))


def test_exact_dedup_finds_planted_dup(docs):
    out = textops.exact_dedup(docs).filter(F.col("n_docs") > 1).collect()
    assert len(out) == 1
    assert out[0].n_docs == 2
    assert out[0].keep_doc_id == 0  # first-wins: min doc_id


def test_doc_fingerprint_stable(docs):
    a = {r.doc_id: r.fp for r in textops.doc_fingerprint(docs).collect()}
    b = {r.doc_id: r.fp for r in textops.doc_fingerprint(docs).collect()}
    assert a == b
    assert a[0] == a[9001]  # exact dup -> same fingerprint


def test_minhash_lsh_finds_near_dup(docs):
    pairs = textops.minhash_dedup_pairs(docs, n_hashes=16, bands=4, threshold=0.5)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert (0, 9001) in got  # exact dup estimated jaccard = 1
    assert (1, 9002) in got  # near dup


def test_minhash_signature_oracle(spark):
    """Signature equals a direct numpy recomputation for one doc."""
    import hashlib

    df = spark.createDataFrame(
        pd.DataFrame([dict(doc_id=1, text="a b c d e f")])
    )
    sig = textops.minhash_signatures(df, n_hashes=8, shingle_k=3).collect()[0].sig
    a, b, p = textops._hash_params(8)
    shingles = {"a b c", "b c d", "c d e", "d e f"}
    base = np.array(
        [
            int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
            & 0x7FFFFFFFFFFFFFFF
            for s in shingles
        ],
        dtype=np.int64,
    )
    expect = ((base[:, None].astype(object) * a[None, :] + b[None, :]) % p).min(axis=0)
    assert sig == [int(v) for v in expect]


def test_simhash_properties(docs):
    sh = {r.doc_id: r.simhash for r in textops.simhash64(docs).collect()}
    assert sh[0] == sh[9001]  # identical text -> identical simhash
    # near-dup differs in few bits
    ham = bin((sh[1] ^ sh[9002]) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham <= 12
    pairs = textops.simhash_near_pairs(docs, max_hamming=12).collect()
    assert any((r.doc_a, r.doc_b) == (0, 9001) for r in pairs)


def test_ngram_jaccard_pairs(docs):
    # low threshold so the 'dup' bucket pair (different base texts) appears
    pairs = textops.ngram_jaccard_pairs(docs, bucket_col="source", min_jaccard=0.0)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in pairs.collect()}
    assert all(a < b for (a, b) in got)
    assert (9001, 9002) in got  # the only two docs sharing bucket 'dup'
    # verify against a direct python recomputation
    texts = {r.doc_id: r.text for r in docs.collect()}
    sa = set(texts[9001].lower().split())
    sb = set(texts[9002].lower().split())
    expect = len(sa & sb) / len(sa | sb)
    assert abs(got[(9001, 9002)] - expect) < 1e-9


def test_quality_and_tokens(docs):
    q = textops.quality_score(docs).collect()
    t = {r.doc_id: r for r in textops.token_stats(docs).collect()}
    for r in q:
        assert 0 < r.distinct_ratio <= 1
        assert 0 <= r.stop_ratio <= 1
        assert r.n_tokens == t[r.doc_id].ws_tokens
    l = textops.lang_id(docs).collect()
    assert all(r.predicted in ("en", "es", "fr", "de") for r in l)


# ---------------------------------------------------------- similarity --


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def brute_topk(emb_pdf, qids, k):
    vecs = {r.vec_id: np.asarray(r.embedding, dtype="f8") for r in emb_pdf.itertuples(index=False)}
    out = {}
    for q in qids:
        qv = vecs[q]
        scored = []
        for vid, v in vecs.items():
            if vid == q:
                continue
            cos = float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))
            scored.append((-cos, vid))
        scored.sort()
        out[q] = [vid for _, vid in scored[:k]]
    return out


def test_cosine_topk_exact(emb):
    pdf = emb.toPandas()
    qids = [0, 1, 2]
    q = emb.filter(F.col("vec_id").isin(qids))
    got = similarity.cosine_topk(emb, q, k=5).toPandas()
    expect = brute_topk(pdf, qids, 5)
    for qid in qids:
        rows = got[got.query_id == qid].sort_values("rank")
        assert rows.neighbor_id.tolist() == expect[qid]


def test_lsh_topk_recall(emb):
    """LSH with multiprobe must reach >= 60% recall@5 vs brute force on
    this corpus (approximate by design; recall asserted, not exactness)."""
    pdf = emb.toPandas()
    qids = list(range(8))
    q = emb.filter(F.col("vec_id").isin(qids))
    got = similarity.lsh_topk(emb, q, k=5, bits=4, tables=8, multiprobe=1).toPandas()
    expect = brute_topk(pdf, qids, 5)
    hits = tot = 0
    for qid in qids:
        approx = set(got[got.query_id == qid].neighbor_id.tolist())
        truth = set(expect[qid])
        hits += len(approx & truth)
        tot += len(truth)
    assert hits / tot >= 0.6, f"recall {hits}/{tot}"


def test_pairwise_near_dups_blocked(emb):
    out = similarity.pairwise_near_dups(emb, threshold=0.4, block_col="label")
    pdf = out.toPandas()
    assert (pdf.id_a < pdf.id_b).all()
    # verify one pair against numpy
    if len(pdf):
        r = pdf.iloc[0]
        vecs = {v.vec_id: np.asarray(v.embedding, dtype="f8") for v in emb.collect()}
        a, b = vecs[r.id_a], vecs[r.id_b]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(cos - r.cosine) < 1e-9
        assert cos >= 0.4
