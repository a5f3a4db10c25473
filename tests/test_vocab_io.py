"""DBoW2 vocabulary file interchange: round-trip through the reference's
OpenCV-YAML text layout (TemplatedVocabulary::save/load format)."""

import gzip
import os
import tempfile

import jax.numpy as jnp
import numpy as np

from plslam_tpu.backend import vocab as V


def _corpus(n=600, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**32, (n, 8), dtype=np.uint64).astype(np.uint32)


def test_roundtrip_plain_and_gz():
    corpus = _corpus()
    voc = V.train_vocabulary(corpus, k=4, depth=3, iters=3)
    for suffix in (".yml", ".yml.gz"):
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "voc" + suffix)
            V.save_dbow2_vocabulary(path, voc)
            voc2 = V.load_dbow2_vocabulary(path)
            assert voc2.k == voc.k and voc2.depth == voc.depth
            for a, b in zip(voc.levels, voc2.levels):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            # identical transforms
            q = jnp.asarray(_corpus(64, seed=1))
            valid = jnp.ones(64, bool)
            v1 = np.asarray(V.transform(voc, q, valid))
            v2 = np.asarray(V.transform(voc2, q, valid))
            np.testing.assert_allclose(v1, v2, atol=1e-6)


def test_nonuniform_tree_loads():
    """A hand-written vocabulary with a shallow leaf and a missing child
    slot (DBoW2 trees are not always complete)."""
    # k=2, L=2: root -> nodes 1,2; node 1 -> leaves 3,4; node 2 shallow leaf
    def d(v):
        return " ".join([str(v)] * 32)

    text = "\n".join([
        "%YAML:1.0", "---", "vocabulary:", "   k: 2", "   L: 2",
        "   scoringType: 0", "   weightingType: 0", "   nodes:",
        f'      - {{ nodeId:1, parentId:0, weight:0., descriptor:"{d(0)}" }}',
        f'      - {{ nodeId:2, parentId:0, weight:0.7, descriptor:"{d(255)}" }}',
        f'      - {{ nodeId:3, parentId:1, weight:0.5, descriptor:"{d(0)}" }}',
        f'      - {{ nodeId:4, parentId:1, weight:0.2, descriptor:"{d(3)}" }}',
        "   words:",
        "      - { wordId:0, nodeId:3 }",
        "      - { wordId:1, nodeId:4 }",
        "      - { wordId:2, nodeId:2 }",
    ])
    with tempfile.TemporaryDirectory() as dd:
        path = os.path.join(dd, "v.yml")
        open(path, "w").write(text)
        voc = V.load_dbow2_vocabulary(path)
        assert voc.k == 2 and voc.depth == 2
        # all-zero descriptor lands in word 0 (node 3); all-ones descriptor
        # descends to node 2's chained leaf
        q = jnp.asarray(np.stack([
            np.zeros(8, np.uint32), np.full(8, 0xFFFFFFFF, np.uint32)]))
        v = np.asarray(V.transform(voc, q, jnp.ones(2, bool)))
        assert v[0] > 0          # zero-descriptor word
        assert v[2] > 0          # chained shallow leaf under node 2
        assert abs(v.sum() - 1.0) < 1e-6


def test_shipped_pretrained_vocabularies_load_and_score():
    """The repo ships small pretrained vocabularies
    (scripts/train_vocabulary.py -> configs/vocab_*_k10L3.yml.gz) as the
    loop closer's cold-start fallback; they must load through the DBoW2
    interchange reader and produce normalized BoW vectors."""
    import glob

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    paths = sorted(glob.glob(os.path.join(root, "vocab_*_k10L3.yml.gz")))
    assert len(paths) == 2, paths
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 2 ** 32, (64, 8),
                                 dtype=np.uint64).astype(np.uint32))
    for p in paths:
        voc = V.load_dbow2_vocabulary(p)
        assert voc.num_words == 1000
        v = np.asarray(V.transform(voc, q, jnp.ones(64, bool)))
        assert v.shape == (1000,)
        assert abs(v.sum() - 1.0) < 1e-5
        assert (v > 0).sum() >= 8     # queries spread over many words
