"""Top-k retrieval serving layer (ccmh/retrieval.py).

The reference has no search entry point (train/base.py stops at mAP +
.mat dumps); these tests pin the new capability: brute-force parity with
deterministic tie-breaking, packed/sharded path equivalence, XLA
dead-code-eliminated single-tower encoders, and the .mat demo CLI.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccmh.clip.model import ClipConfig, init_clip_params
from ccmh.config import Config
from ccmh.parallel.mesh import make_mesh
from ccmh.retrieval import HashIndex, Retriever, topk_search, topk_search_sharded
from ccmh.train.methods import get_method

TINY = ClipConfig.tiny()


def brute_force(q, g, k):
    """Stable numpy oracle: ascending distance, ties by gallery index."""
    kk = q.shape[1]
    d = (kk - q.astype(np.int32) @ g.T.astype(np.int32)) // 2
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, 1), idx


def random_codes(n, k, seed, with_ties=True):
    rng = np.random.default_rng(seed)
    g = np.where(rng.standard_normal((n, k)) > 0, 1, -1).astype(np.int8)
    if with_ties and n > 120:
        g[5] = g[17]
        g[100] = g[17]   # duplicate rows force distance ties
    return g


def test_topk_matches_bruteforce():
    g = random_codes(500, 16, 0)
    q = random_codes(37, 16, 1, with_ties=False)
    q[0] = g[17]  # exact-duplicate query: three tied zero-distance rows
    bd, bi = brute_force(q, g, 10)
    d, i = topk_search(q, g, 10)
    np.testing.assert_array_equal(d, bd)
    np.testing.assert_array_equal(i, bi)


def test_topk_k_clamped_and_small_gallery():
    g = random_codes(6, 32, 2, with_ties=False)
    q = random_codes(3, 32, 3, with_ties=False)
    d, i = topk_search(q, g, 50)       # k > N clamps to N
    assert d.shape == (3, 6) and i.shape == (3, 6)
    bd, bi = brute_force(q, g, 6)
    np.testing.assert_array_equal(i, bi)


def test_topk_packed_matches_int8():
    g = random_codes(300, 64, 4)
    q = random_codes(29, 64, 5, with_ties=False)
    bd, bi = brute_force(q, g, 7)
    idx = HashIndex(g, packed=True)
    d, i = idx.search(q, 7)
    np.testing.assert_array_equal(d, bd)
    np.testing.assert_array_equal(i, bi)


def test_topk_sharded_matches_single():
    """Gallery axis over the 8-device mesh; N not divisible by 8 exercises
    the padding sentinel (pad rows must never appear in results)."""
    mesh = make_mesh(8)
    g = random_codes(501, 16, 6)
    q = random_codes(37, 16, 7, with_ties=False)
    q[3] = g[100]
    bd, bi = brute_force(q, g, 12)
    d, i = topk_search_sharded(q, g, 12, mesh)
    np.testing.assert_array_equal(d, bd)
    np.testing.assert_array_equal(i, bi)
    # packed + sharded through the index wrapper
    idx = HashIndex(g, packed=True, mesh=mesh)
    d2, i2 = idx.search(q, 12)
    np.testing.assert_array_equal(d2, bd)
    np.testing.assert_array_equal(i2, bi)


def test_topk_large_k_terminates_and_matches():
    """k >= the 512 selection block: the blocked recursion must widen its
    block (k=512 previously never shrank the rows — an infinite trace-time
    loop) and still return the exact stable order."""
    g = random_codes(4096, 16, 8)
    q = random_codes(3, 16, 9, with_ties=False)
    for k in (511, 512, 600):
        bd, bi = brute_force(q, g, k)
        d, i = topk_search(q, g, k)
        np.testing.assert_array_equal(d, bd)
        np.testing.assert_array_equal(i, bi)


def test_topk_sharded_k_exceeds_shard():
    """k larger than the per-shard row count: each shard contributes ALL its
    rows (sentinel-padded to k) and the merge still returns the exact global
    order — previously lax.top_k(k > per) crashed at trace time."""
    mesh = make_mesh(8)
    g = random_codes(64, 16, 10)     # per-shard = 8 rows
    q = random_codes(5, 16, 11, with_ties=False)
    bd, bi = brute_force(q, g, 20)   # k=20 > 8
    d, i = topk_search_sharded(q, g, 20, mesh)
    np.testing.assert_array_equal(d, bd)
    np.testing.assert_array_equal(i, bi)


def test_topk_empty_queries():
    g = random_codes(64, 16, 12)
    d, i = topk_search(np.empty((0, 16), np.int8), g, 5)
    assert d.shape == (0, 5) and i.shape == (0, 5)
    d, i = topk_search_sharded(np.empty((0, 16), np.int8), g, 5, make_mesh(8))
    assert d.shape == (0, 5) and i.shape == (0, 5)


def test_sharded_search_gathers_only_candidates():
    """The compiled sharded search must all-gather ONLY the per-shard
    [C, k] candidate sets — never the [C, N] distance matrix (which would
    defeat the gallery sharding).  Checked on the HLO of the cached
    executable: every all-gather output stays k-sized per shard."""
    import re

    from ccmh.ops.hamming import hamming_distance
    from ccmh.retrieval import _idx_bits, _sharded_search_fn

    mesh = make_mesh(8)
    n, c, k_bits, k = 1600, 64, 16, 10
    per = n // 8
    fn = _sharded_search_fn(mesh, "data", hamming_distance, k,
                            _idx_bits(n), per, n)
    q = jnp.zeros((c, k_bits), jnp.int8)
    g = jnp.zeros((n, k_bits), jnp.int8)
    hlo = fn.lower(q, g).compile().as_text()
    gathered = re.findall(r"= s32\[(\d+),(\d+)\][^\n]*all-gather\(", hlo)
    assert gathered, "expected candidate all-gathers in the sharded search"
    for rows, cols in gathered:
        # [C, ndev*k] at most — candidate sets, not the [C, per] distances
        assert int(rows) == c and int(cols) <= 8 * k, (rows, cols)


def test_custom_dist_fn_search():
    """DPSIH-style ranking: dist_fn replaces Hamming (multi-embed max-sim,
    train/DPSIH/_utils.py:16-26)."""
    from ccmh.train.methods.dpsih import make_dist_fn

    k_dim, n_embed = 16, 2
    g = random_codes(120, k_dim * n_embed, 8, with_ties=False)
    q = random_codes(9, k_dim * n_embed, 9, with_ties=False)
    dfn = make_dist_fn(k_dim)
    d_full = np.asarray(dfn(jnp.asarray(q, jnp.float32), jnp.asarray(g, jnp.float32)))
    idx_ref = np.argsort(d_full, axis=1, kind="stable")[:, :5]
    idx = HashIndex(g, dist_fn=dfn, max_dist=k_dim)
    d, i = idx.search(q, 5)
    np.testing.assert_array_equal(i, idx_ref)
    np.testing.assert_array_equal(d, np.take_along_axis(d_full, idx_ref, 1))


def test_precision_at_k():
    g = random_codes(200, 16, 10)
    labels = np.zeros((200, 4), np.float32)
    labels[:, 0] = 1.0  # every gallery item shares label 0
    ql = np.zeros((5, 4), np.float32)
    ql[:, 0] = 1.0
    idx = HashIndex(g, labels=labels)
    assert idx.precision_at_k(random_codes(5, 16, 11, with_ties=False), ql, 10) == 1.0
    ql2 = np.zeros((5, 4), np.float32)
    ql2[:, 1] = 1.0     # no gallery item has label 1
    assert idx.precision_at_k(random_codes(5, 16, 11, with_ties=False), ql2, 10) == 0.0


def _build_retriever(method_name="DSPH", output_dim=16):
    cfg = Config(method=method_name, output_dim=output_dim, nclass=8,
                 batch_size=8, epochs=1, resolution=TINY.image_resolution,
                 train_num=16)
    method = get_method(method_name)
    key = jax.random.PRNGKey(0)
    heads, extra, aux = method.init(key, cfg, TINY)
    params = {"clip": init_clip_params(key, TINY), **heads}
    return Retriever(method, params, aux, cfg, TINY), method, params, aux, cfg


def _demo_ids(n):
    return np.tile(np.asarray([[49406] + [320] * 5 + [49407] + [0] * 25],
                              np.int32), (n, 1))


def test_retriever_single_tower_matches_joint_encode():
    r, method, params, aux, cfg = _build_retriever()
    rng = np.random.RandomState(0)
    ids = _demo_ids(5)
    imgs = rng.randn(5, TINY.image_resolution, TINY.image_resolution, 3).astype(np.float32)
    batch = {"image": jnp.asarray(imgs), "text": jnp.asarray(ids)}
    joint_img, joint_txt = method.encode(params, aux, batch, cfg, TINY)
    np.testing.assert_array_equal(r.encode_texts(ids), np.asarray(joint_txt))
    np.testing.assert_array_equal(r.encode_images(imgs), np.asarray(joint_img))


def test_retriever_dead_code_eliminates_other_tower():
    """The single-tower wrappers must compile WITHOUT the unused tower:
    each one's flop count is strictly below the joint encode's, and the
    two together add up to roughly the joint (the towers partition it)."""
    r, method, params, aux, cfg = _build_retriever()
    ids = jnp.asarray(_demo_ids(5))
    imgs = jnp.zeros((5, TINY.image_resolution, TINY.image_resolution, 3), jnp.float32)

    def joint(p, a, im, i):
        return method.encode(p, a, {"image": im, "text": i}, cfg, TINY)

    f_joint = jax.jit(joint).lower(params, aux, imgs, ids).compile().cost_analysis()["flops"]
    f_text = r._text_codes.lower(params, aux, ids).compile().cost_analysis()["flops"]
    f_image = r._image_codes.lower(params, aux, imgs).compile().cost_analysis()["flops"]
    assert f_text < 0.95 * f_joint
    assert f_image < 0.95 * f_joint
    assert f_text + f_image <= 1.05 * f_joint


def test_retriever_chunked_encode_padding():
    """Ragged final encode chunk: padding rows must not leak into output."""
    r, _, _, _, _ = _build_retriever()
    ids = _demo_ids(7)
    a = r.encode_texts(ids, batch_size=4)
    b = r.encode_texts(ids, batch_size=7)
    np.testing.assert_array_equal(a, b)


def test_retriever_empty_list_inputs():
    """encode_texts([]) / encode_images([]): the 1-D empty array a bare
    list decays to must normalize to the real [0, ...] input shape before
    the _chunked probe (regression: the probe padded the 1-D array and
    crashed inside the tower trace)."""
    r, _, _, _, cfg = _build_retriever()
    out = r.encode_texts([])
    assert out.shape == (0, cfg.output_dim)
    out = r.encode_images([])
    assert out.shape == (0, cfg.output_dim)
    # pre-tokenized 2-D empties keep working too
    out = r.encode_texts(np.empty((0, cfg.max_words), np.int32))
    assert out.shape == (0, cfg.output_dim)


def test_retriever_e2e_search_with_mask_method():
    """MITH (needs_mask): key_padding_mask is derived inside the wrapper."""
    r, _, _, _, _ = _build_retriever("MITH")
    rng = np.random.RandomState(1)
    imgs = rng.randn(6, TINY.image_resolution, TINY.image_resolution, 3).astype(np.float32)
    index = r.build_image_index(images=imgs)
    d, i = r.search_text2image(_demo_ids(3), index, k=4)
    assert d.shape == (3, 4) and i.shape == (3, 4)
    assert (i >= 0).all() and (i < 6).all()


def test_retriever_dist_fn_method_index():
    """DPSIH: the index inherits the method's multi-embed dist_fn."""
    r, _, _, _, cfg = _build_retriever("DPSIH")
    rng = np.random.RandomState(2)
    imgs = rng.randn(6, TINY.image_resolution, TINY.image_resolution, 3).astype(np.float32)
    index = r.build_image_index(images=imgs)
    assert index.dist_fn is not None
    codes = r.encode_images(imgs)
    assert codes.shape[1] > cfg.output_dim  # flattened multi-embed
    d, i = r.search_text2image(_demo_ids(3), index, k=2)
    assert d.shape == (3, 2)


def test_hash_index_from_mat_and_demo_cli(tmp_path):
    import scipy.io as scio

    from ccmh.retrieval import _demo

    g_img = random_codes(80, 16, 12)
    q_txt = random_codes(10, 16, 13, with_ties=False)
    labels = (np.random.RandomState(3).rand(80, 4) > 0.5).astype(np.float64)
    ql = (np.random.RandomState(4).rand(10, 4) > 0.5).astype(np.float64)
    path = os.path.join(str(tmp_path), "16-ours-synthetic-i2t.mat")
    scio.savemat(path, {
        "q_img": q_txt.astype(np.float64), "q_txt": q_txt.astype(np.float64),
        "r_img": g_img.astype(np.float64), "r_txt": g_img.astype(np.float64),
        "q_l": ql, "r_l": labels,
    })
    idx = HashIndex.from_mat(path)
    assert len(idx) == 80 and idx.labels is not None
    d, i = idx.search(q_txt, 5)
    bd, bi = brute_force(q_txt, g_img, 5)
    np.testing.assert_array_equal(i, bi)
    assert _demo([path, "--topk", "3", "--queries", "2"]) == 0


def test_retriever_from_pretrained_dataset_free(tmp_path):
    """Deployment path: train via the CLI, then build a Retriever from the
    orbax state_ckpt with NO dataset on hand; codes must match the
    trainer's in-memory state."""
    from ccmh.cli import main
    from ccmh.data.synthetic import write_synthetic_mat_dataset

    data_dir = write_synthetic_mat_dataset(str(tmp_path / "data"), n=48,
                                           n_class=6, resolution=32)
    trainer = main([
        "--method", "DSPH", "--dataset", "synthetic", "--output-dim", "16",
        "--data-dir", data_dir, "--save-dir", str(tmp_path / "out"),
        "--epochs", "1", "--batch-size", "12", "--query-num", "12",
        "--train-num", "24", "--eval-batch", "12", "--clip-arch", "tiny",
        "--checkpoint-every", "1",
    ])
    ckpt = os.path.join(trainer.cfg.save_dir, "state_ckpt")
    live = Retriever.from_trainer(trainer)

    cfg = trainer.cfg.replace(pretrained=ckpt)
    served = Retriever.from_pretrained(cfg, clip_cfg=trainer.clip_cfg)
    ids = _demo_ids(4)
    np.testing.assert_array_equal(served.encode_texts(ids),
                                  live.encode_texts(ids))
    rng = np.random.RandomState(7)
    imgs = rng.randn(4, trainer.clip_cfg.image_resolution,
                     trainer.clip_cfg.image_resolution, 3).astype(np.float32)
    np.testing.assert_array_equal(served.encode_images(imgs),
                                  live.encode_images(imgs))

    # npz interchange form too
    npz = os.path.join(str(tmp_path), "w.npz")
    trainer.save_checkpoint(npz)
    served2 = Retriever.from_pretrained(cfg.replace(pretrained=npz),
                                        clip_cfg=trainer.clip_cfg)
    np.testing.assert_array_equal(served2.encode_texts(ids),
                                  live.encode_texts(ids))

    with pytest.raises(ValueError):
        Retriever.from_pretrained(cfg.replace(pretrained=""))


def test_index_validation_errors():
    g = random_codes(10, 16, 14, with_ties=False)
    with pytest.raises(ValueError):
        HashIndex(g[0])                       # not 2-D
    with pytest.raises(ValueError):
        HashIndex(g, labels=np.zeros((3, 2)))  # row mismatch
    with pytest.raises(ValueError):
        HashIndex(g, packed=True, dist_fn=lambda a, b: a)
    with pytest.raises(ValueError):
        topk_search(g, g, 3, dist_fn=lambda a, b: a)  # max_dist required
    idx = HashIndex(g)
    with pytest.raises(ValueError):
        idx.precision_at_k(g, np.zeros((10, 2)), 3)   # no labels


@pytest.mark.parametrize("packed", [False, True])
def test_index_add_matches_rebuild(packed):
    """HashIndex.add: searches after appends (in-capacity AND through a
    capacity growth) equal a fresh index over the concatenated gallery —
    identical distances, indices, and stable tie order."""
    g0 = random_codes(900, 32, 10)
    g1 = random_codes(100, 32, 11)          # fits packed capacity (1024)
    g2 = random_codes(300, 32, 12)          # forces growth
    q = random_codes(23, 32, 13, with_ties=False)
    q[1] = g1[4]                            # ties across the appended rows
    q[2] = g2[9]

    idx = HashIndex(g0, packed=packed)
    idx.add(g1)
    assert len(idx) == 1000
    d_a, i_a = idx.search(q, 12)
    fresh = HashIndex(np.concatenate([g0, g1]), packed=packed)
    d_b, i_b = fresh.search(q, 12)
    np.testing.assert_array_equal(d_a, d_b)
    np.testing.assert_array_equal(i_a, i_b)

    idx.add(g2)
    assert len(idx) == 1300
    d_a, i_a = idx.search(q, 12)
    full = np.concatenate([g0, g1, g2])
    d_b, i_b = HashIndex(full, packed=packed).search(q, 12)
    np.testing.assert_array_equal(d_a, d_b)
    np.testing.assert_array_equal(i_a, i_b)
    bd, bi = brute_force(q, full, 12)
    np.testing.assert_array_equal(d_a, bd)
    np.testing.assert_array_equal(i_a, bi)


def test_index_add_no_recompile():
    """Appends within capacity must not recompile the search executable
    (idx_bits covers capacity; the valid count is a runtime arg).  Only a
    capacity GROWTH may mint a new executable."""
    from ccmh.retrieval import _search_fn

    g = random_codes(600, 16, 14)
    idx = HashIndex(g)
    idx.search(random_codes(4, 16, 15, with_ties=False), 5)
    idx.add(random_codes(50, 16, 16))     # 650 > 600: grows to 1200
    idx.search(random_codes(4, 16, 26, with_ties=False), 5)
    info0 = _search_fn.cache_info()
    for seed in (17, 18, 19):             # 150 more rows: stays within 1200
        idx.add(random_codes(50, 16, seed))
        idx.search(random_codes(4, 16, seed + 10, with_ties=False), 5)
    info1 = _search_fn.cache_info()
    assert info1.misses == info0.misses, (info0, info1)


def test_index_add_labels_and_errors():
    g = random_codes(200, 16, 20)
    labels = (np.random.RandomState(0).rand(200, 5) < 0.4).astype(np.float32)
    idx = HashIndex(g, labels=labels)
    add_l = (np.random.RandomState(1).rand(40, 5) < 0.4).astype(np.float32)
    idx.add(random_codes(40, 16, 21), labels=add_l)
    assert idx.labels.shape == (240, 5)
    q = random_codes(6, 16, 22, with_ties=False)
    ql = (np.random.RandomState(2).rand(6, 5) < 0.4).astype(np.float32)
    p = idx.precision_at_k(q, ql, 10)
    assert 0.0 <= p <= 1.0

    with pytest.raises(ValueError, match="labels"):
        idx.add(random_codes(3, 16, 23))          # labeled index needs labels
    with pytest.raises(ValueError, match="codes must be"):
        idx.add(np.ones((3, 8), np.int8))         # wrong width
    unlabeled = HashIndex(g)
    with pytest.raises(ValueError, match="labels"):
        unlabeled.add(random_codes(3, 16, 24), labels=add_l[:3])

    mesh_idx = HashIndex(g, mesh=make_mesh(8))
    with pytest.raises(NotImplementedError, match="reshard"):
        mesh_idx.add(random_codes(3, 16, 25))


@pytest.mark.parametrize("packed", [False, True])
def test_index_save_load_roundtrip(tmp_path, packed):
    """save/load: a serving restart reloads the PREPARED gallery (one
    device put, no re-encode/re-pack) and searches identically — including
    an index that had grown through add()."""
    g = random_codes(700, 32, 30)
    labels = (np.random.RandomState(3).rand(700, 5) < 0.4).astype(np.float32)
    idx = HashIndex(g, labels=labels, packed=packed)
    idx.add(random_codes(400, 32, 31),
            labels=(np.random.RandomState(4).rand(400, 5) < 0.4).astype(np.float32))
    path = str(tmp_path / "index.npz")
    idx.save(path)

    idx2 = HashIndex.load(path)
    assert len(idx2) == 1100 and idx2.packed == packed
    assert idx2.labels.shape == (1100, 5)
    q = random_codes(9, 32, 32, with_ties=False)
    d_a, i_a = idx.search(q, 15)
    d_b, i_b = idx2.search(q, 15)
    np.testing.assert_array_equal(d_a, d_b)
    np.testing.assert_array_equal(i_a, i_b)
    ql = (np.random.RandomState(5).rand(9, 5) < 0.4).astype(np.float32)
    assert idx.precision_at_k(q, ql, 10) == idx2.precision_at_k(q, ql, 10)


def test_index_load_into_mesh(tmp_path):
    """A saved index can be reloaded sharded over a mesh."""
    g = random_codes(512, 16, 33)
    path = str(tmp_path / "index.npz")
    HashIndex(g).save(path)
    idx = HashIndex.load(path, mesh=make_mesh(8))
    q = random_codes(5, 16, 34, with_ties=False)
    d, i = idx.search(q, 8)
    bd, bi = brute_force(q, g, 8)
    np.testing.assert_array_equal(d, bd)
    np.testing.assert_array_equal(i, bi)
