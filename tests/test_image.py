"""Image deal end-to-end: bytes column round-trip, host decode to pixels,
patch-projection into the tower, and a training step through Dssm.

Reference parity surface: make_tfrecord.py:70-79 (raw image bytes in the
record) + dataloader.py:60-89 (decode_jpeg/webp second parse). We decode
host-side (XLA has no string/bytes dtype) and fold pixels into the tower
with an 8x8 patchify + linear projection (ops/embedding.py:patch_embed).
"""
import io
import os

import numpy as np
import pytest

from recommendflow_tpu.config import Configuration
from recommendflow_tpu.data import recordio
from recommendflow_tpu.data.pipeline import Dataset
from recommendflow_tpu.data.schema import compile_schema
from recommendflow_tpu.data.synthetic import generate_records

CONF = """
Features:
  feature_group:
    user_id: [user_id]
    item_id: [item_id]
    item_img: [item_img]
  feature_fields: [group, type, tower, deal, vocab, embedding_dim, pooling, working]
  features:
    user_id,str,user,hashing,2000,16,sum,true
    item_id,str,ad,hashing,2000,16,sum,true
    item_img,str,ad,image,null,24,null,true
    label,float,label,numeric,null,-1,null,true
Variables:
  seeds: [2022, 2023]
  max_len_map:
    item_img: 32
Networks:
  class: recommendflow_tpu.models.matching.dssm.Dssm
  loss: recommendflow_tpu.losses.match.batch_neg_sample_scaled_multi_class_ce_loss
  embedding_dim: 32
  tower_units: [32]
Task:
  task: test_image
Train:
  data: /tmp/unused
  epoch: 1
  batch_size: 16
"""


@pytest.fixture(scope="module")
def conf(tmp_path_factory):
    p = tmp_path_factory.mktemp("imgconf") / "img.yaml"
    p.write_text(CONF)
    return Configuration(str(p))


@pytest.fixture(scope="module")
def records(conf, tmp_path_factory):
    out = tmp_path_factory.mktemp("imgdata")
    return generate_records(conf, str(out), num_rows=128, num_files=1, seed=3)


def _png(color, size=(10, 14)):
    from PIL import Image
    buf = io.BytesIO()
    Image.new("RGB", size, color).save(buf, format="PNG")
    return buf.getvalue()


def test_bytes_column_roundtrip(tmp_path):
    path = str(tmp_path / "b.rfb")
    specs = [recordio.ColumnSpec("img", "bytes"), recordio.ColumnSpec("k", "int")]
    payloads = [os.urandom(37), b"", os.urandom(5)]
    with recordio.RecordWriter(path, specs) as w:
        w.write_row({"img": [payloads[0]], "k": [1]})
        w.write_row({"img": [], "k": [2]})          # missing image
        w.write_row({"img": [payloads[2]], "k": [3]})
    nrows, block = next(recordio.iter_blocks(path))
    vals, splits = block["img"]
    assert nrows == 3
    assert isinstance(vals, recordio.BytesColumn)
    assert bytes(vals[0]) == payloads[0]
    assert list(splits) == [0, 1, 1, 2]
    assert bytes(vals[1]) == payloads[2]


def test_schema_and_batch_shapes(conf, records):
    schema = compile_schema(conf.features)
    slot = schema.slots["item_img"]
    assert slot.kind == "image"
    assert slot.max_len == 32          # from max_len_map, already 8-aligned
    assert slot.out_dim == 24
    batch = next(iter(Dataset(schema, records, batch_size=16, shuffle=False)))
    img = batch["item_img"]
    assert img.shape == (16, 32, 32, 3)
    assert img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert img.max() > 0.1             # synthetic images are non-black


def test_image_decode_resize_and_missing():
    from recommendflow_tpu.data.pipeline import _decode_images
    blobs = np.asarray([_png((255, 0, 0)), _png((0, 255, 0), (40, 40))],
                       dtype=object)
    splits = np.asarray([0, 1, 1, 2], dtype=np.int32)  # row 1 missing
    out = _decode_images(blobs, splits, side=16)
    assert out.shape == (3, 16, 16, 3)
    assert np.allclose(out[0, :, :, 0], 1.0, atol=0.02)   # red channel
    assert np.allclose(out[1], 0.0)                        # missing -> zeros
    assert np.allclose(out[2, :, :, 1], 1.0, atol=0.02)   # green channel


def test_patch_embed_shapes():
    import jax
    import jax.numpy as jnp

    from recommendflow_tpu.ops.embedding import IMAGE_PATCH, patch_embed
    imgs = jnp.ones((4, 32, 32, 3))
    proj = jax.random.normal(jax.random.PRNGKey(0),
                             (IMAGE_PATCH * IMAGE_PATCH * 3, 24))
    out = patch_embed(proj, imgs)
    assert out.shape == (4, 24)
    # constant image: every patch identical -> mean == single patch value
    single = jnp.ones((1, IMAGE_PATCH * IMAGE_PATCH * 3)) @ proj
    assert np.allclose(out[0], single[0], atol=1e-4)


def test_train_step_with_image_feature(conf, records):
    import jax

    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.train import Trainer

    schema = compile_schema(conf.features)
    model, _ = build_network(conf.networks["class"], {"conf": conf})
    ds = Dataset(schema, records, batch_size=16, shuffle=False)
    trainer = Trainer(model, learning_rate=1e-2)
    batch = next(iter(ds))
    state = trainer.init_state(trainer._put(batch))
    # the image projection is a trained param
    flat = jax.tree_util.tree_leaves_with_path(state.params)
    assert any("img_proj_item_img" in "/".join(str(getattr(p, "key", p))
                                               for p in path)
               for path, _ in flat)
    losses = []
    for _ in range(8):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]      # learns through the image channel too


@pytest.mark.slow
def test_train_step_with_vit_image_encoder(conf, records, tmp_path_factory):
    """Networks image_encoder: vit routes the image slot through the full
    ViT ImageEncoder (patch + CLS + transformer blocks) instead of the
    linear projection; a training step must run and update its params."""
    import jax
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.train import Trainer

    p = tmp_path_factory.mktemp("vitconf") / "vit.yaml"
    p.write_text(CONF.replace("Networks:", "Networks:\n  image_encoder: vit"))
    vconf = Configuration(str(p))
    schema = compile_schema(vconf.features)
    model, _ = build_network(vconf.networks["class"], {"conf": vconf})
    ds = Dataset(schema, records, batch_size=16)
    batch = next(iter(ds))
    trainer = Trainer(model, learning_rate=1e-3)
    state = trainer.init_state(batch)
    flat = jax.tree_util.tree_leaves_with_path(state.params)
    vit_keys = [k for k, _ in flat if "vit_item_img" in "/".join(
        str(getattr(s, "key", s)) for s in k)]
    assert vit_keys, "ViT encoder params missing"
    before = {"/".join(str(getattr(s, "key", s)) for s in k): np.asarray(v)
              for k, v in flat if "vit_item_img" in str(k)}
    state, m = trainer.train_step(state, batch)
    assert np.isfinite(float(m["loss"]))
    after = {"/".join(str(getattr(s, "key", s)) for s in k): np.asarray(v)
             for k, v in jax.tree_util.tree_leaves_with_path(state.params)
             if "vit_item_img" in str(k)}
    changed = any(not np.allclose(before[k], after[k]) for k in before)
    assert changed, "ViT params did not update"
