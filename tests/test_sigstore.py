"""Pre-banded signature store: O(|new|) incremental dedup probe.

Covers the round-4 scale fix: the stored ``doc_sig_bands`` index replaces
the per-batch corpus-signature explode + corpus-wide ``distinct()``.
"""

import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geotrellis_landsat_emr_demo_spark.catalog import Catalog
from geotrellis_landsat_emr_demo_spark.operators import sigstore, textops

SCRATCH = os.path.join(os.path.dirname(__file__), "..", ".scratch", "pytest")


def _doc(i, text):
    return dict(doc_id=i, text=text, lang="en", source="s", n_chars=len(text))


@pytest.fixture()
def corpus(spark):
    rows = [
        _doc(i, f"alpha beta gamma delta epsilon zeta token{i} tail{i % 7}")
        for i in range(40)
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_banded_probe_matches_full_recompute(spark, corpus):
    """incremental_minhash_pairs with a stored pre-banded index returns
    byte-identical pairs to the round-3 full-recompute path."""
    batch = spark.createDataFrame(
        pd.DataFrame(
            [
                _doc(100, "alpha beta gamma delta epsilon zeta token3 tail3"),
                _doc(101, "completely different words none shared here at all"),
                _doc(102, "alpha beta gamma delta epsilon zeta token7 tail0"),
            ]
        )
    )
    sigs = textops.minhash_portable_signatures(corpus, 8).localCheckpoint(eager=True)
    full = textops.incremental_minhash_pairs(
        batch, sigs, n_hashes=8, bands=4, threshold=0.25
    ).collect()

    root = os.path.join(SCRATCH, "sigstore-eq")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    staged = sigstore.stage_sig_bands(
        cat, textops._minhash_banded(sigs, 4, 2), n_partitions=64
    )
    cat.commit({sigstore.SIG_BANDS_TABLE: staged})
    new_sigs = textops.minhash_portable_signatures(batch, 8).localCheckpoint(eager=True)
    nb = textops._minhash_banded(new_sigs, 4, 2)
    pruned = sigstore.probe_sig_bands(spark, cat, nb, n_partitions=64)
    got = textops.incremental_minhash_pairs(
        batch,
        sigs,
        n_hashes=8,
        bands=4,
        threshold=0.25,
        corpus_bands=pruned,
        new_sigs=new_sigs,
    ).collect()

    key = lambda r: (r.doc_a, r.doc_b)  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, full))
    assert {key(r): round(r.est_jaccard, 9) for r in got} == {
        key(r): round(r.est_jaccard, 9) for r in full
    }
    assert {key(r): r.is_new_pair for r in got} == {
        key(r): r.is_new_pair for r in full
    }


def test_compaction_enables_file_pruning(spark, corpus):
    """After compact_sig_bands, a small probe's file set is a strict
    subset of the table's files (bp_min/bp_max metadata pruning), and the
    probe result is unchanged."""
    root = os.path.join(SCRATCH, "sigstore-prune")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    sigs = textops.minhash_portable_signatures(corpus, 8).localCheckpoint(eager=True)
    banded = textops._minhash_banded(sigs, 4, 2)
    cat.commit(
        {sigstore.SIG_BANDS_TABLE: sigstore.stage_sig_bands(cat, banded, 4096)}
    )
    n_files = sigstore.compact_sig_bands(spark, cat, n_partitions=4096, n_files=16)
    assert n_files > 1
    # every compacted file carries range metadata
    metas = [m for _, m in cat.file_entries(sigstore.SIG_BANDS_TABLE)]
    assert all(m and "bp_min" in m and m.get("compacted") for m in metas)

    one = spark.createDataFrame(
        pd.DataFrame([_doc(500, "alpha beta gamma delta epsilon zeta token1 tail1")])
    )
    nb = textops._minhash_banded(
        textops.minhash_portable_signatures(one, 8), 4, 2
    ).localCheckpoint(eager=True)
    pruned = sigstore.probe_sig_bands(spark, cat, nb, n_partitions=4096)
    # a 1-doc probe (4 buckets) must not read all 16 range files
    pruned_files = {
        os.path.basename(f) for f in pruned.inputFiles()
    }
    all_files = {
        os.path.basename(p) for p, _ in cat.file_entries(sigstore.SIG_BANDS_TABLE)
    }
    assert pruned_files and pruned_files < all_files
    # the pruned slice still contains every colliding corpus row
    unpruned = cat.read_spark(spark, sigstore.SIG_BANDS_TABLE).select(
        "doc_id", "band", "bucket"
    )
    hit_full = nb.join(unpruned, ["band", "bucket"]).select(
        unpruned.doc_id, "band", "bucket"
    )
    hit_pruned = nb.join(pruned, ["band", "bucket"]).select(
        pruned.doc_id, "band", "bucket"
    )
    assert sorted(map(tuple, hit_pruned.collect())) == sorted(
        map(tuple, hit_full.collect())
    )


def test_stream_dedup_null_text_never_drifts(spark, tmp_path):
    """A doc with NULL text still gets a doc_sigs row and a banded-index
    row — docs, doc_sigs and doc_sig_bands stay in lockstep; a later
    exact duplicate of the degenerate doc is caught."""
    from geotrellis_landsat_emr_demo_spark.streaming import incremental as inc

    docs_dir = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(docs_dir)
    cat = Catalog(str(tmp_path / "cat"))
    b1 = pd.DataFrame(
        [
            dict(doc_id=1, text=None, lang="en", source="s", n_chars=0),
            dict(doc_id=2, text="regular words in here", lang="en", source="s", n_chars=21),
        ]
    )
    b1.to_parquet(os.path.join(docs_dir, "b1.parquet"))
    q = inc.stream_dedup_docs(spark, docs_dir, cat, ckpt, threshold=0.5)
    q.processAllAvailable()
    q.stop()
    assert sorted(cat.read_pandas("docs").doc_id) == [1, 2]
    assert sorted(cat.read_pandas("doc_sigs").doc_id) == [1, 2]
    bands = cat.read_pandas(sigstore.SIG_BANDS_TABLE)
    assert sorted(bands.doc_id.unique()) == [1, 2]
    # batch 2: another null-text doc == exact dup of doc 1's empty signing
    b2 = pd.DataFrame([dict(doc_id=9, text=None, lang="en", source="s", n_chars=0)])
    # all-null pandas column would otherwise write a non-string parquet type
    b2["text"] = b2["text"].astype("string")
    b2.to_parquet(os.path.join(docs_dir, "b2.parquet"))
    q = inc.stream_dedup_docs(spark, docs_dir, cat, ckpt, threshold=0.5)
    q.processAllAvailable()
    q.stop()
    assert sorted(cat.read_pandas("docs").doc_id) == [1, 2]  # 9 quarantined
    rej = cat.read_pandas("doc_rejects")
    assert (9, 1) in set(zip(rej.doc_id, rej.matched_doc))


def test_kmeans_zero_norm_vector_is_safe(spark):
    """An all-zero embedding must not poison kmeans_fit (guarded norm)."""
    from geotrellis_landsat_emr_demo_spark.operators import similarity

    rng_rows = [
        dict(vec_id=i, embedding=[float((i + j) % 5 - 2) for j in range(8)])
        for i in range(20)
    ]
    rng_rows.append(dict(vec_id=99, embedding=[0.0] * 8))
    df = spark.createDataFrame(pd.DataFrame(rng_rows))
    cents, assigns, hist = similarity.kmeans_fit(df, k=3, iters=2, dim=8)
    out = assigns.toPandas()
    assert len(out) == 21 and out.cell.notna().all()
    assert all(h == h for h in hist)  # no NaNs in the objective
