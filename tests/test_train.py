"""Training-stack tests: losses, optimizer groups, and the sharded step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molnextr_tpu.config import tiny_test_config
from molnextr_tpu.models.model import MolNexTRModel
from molnextr_tpu.parallel import make_mesh, shard_batch
from molnextr_tpu.tokenization import MASK_ID, PAD_ID, get_tokenizer
from molnextr_tpu.train import Criterion, create_train_state, make_schedules
from molnextr_tpu.train.losses import EDGE_IGNORE, graph_loss, sequence_loss
from molnextr_tpu.train.step import jit_train_step


class TestSequenceLoss:
    def test_ignores_pad_and_mask(self):
        V = 10
        logits = jnp.zeros((1, 4, V))
        labels = jnp.asarray([[1, 5, PAD_ID, MASK_ID, 6]], jnp.int32)
        # uniform logits -> per-token loss = log(V) regardless of target
        loss = sequence_loss(logits, labels, smoothing=0.0)
        np.testing.assert_allclose(float(loss), np.log(V), rtol=1e-5)

    def test_smoothing_increases_loss_on_confident_preds(self):
        V = 10
        logits = jnp.full((1, 2, V), -10.0)
        logits = logits.at[:, :, 3].set(10.0)
        labels = jnp.asarray([[1, 3, 3]], jnp.int32)
        hard = sequence_loss(logits, labels, smoothing=0.0)
        smooth = sequence_loss(logits, labels, smoothing=0.1)
        assert float(smooth) > float(hard)

    def test_matches_manual_ce(self):
        rng = np.random.RandomState(0)
        V, T = 9, 5
        logits = jnp.asarray(rng.randn(2, T - 1, V).astype(np.float32))
        labels = jnp.asarray(rng.randint(5, V, size=(2, T)), jnp.int32)
        loss = sequence_loss(logits, labels, smoothing=0.0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        manual = -np.take_along_axis(
            np.asarray(logp), np.asarray(labels)[:, 1:, None], axis=-1
        ).mean()
        np.testing.assert_allclose(float(loss), manual, rtol=1e-5)


class TestGraphLoss:
    def test_class_weighting(self):
        # all-correct "no bond" vs all-correct "single bond": loss identical
        # at optimum, but gradients of wrong predictions are 10x heavier for
        # real-bond classes; check the weighted-mean normalization
        logits = jnp.zeros((1, 7, 2, 2))
        targets_none = jnp.zeros((1, 2, 2), jnp.int32)
        targets_single = jnp.ones((1, 2, 2), jnp.int32)
        l0 = graph_loss(logits, targets_none)
        l1 = graph_loss(logits, targets_single)
        # uniform logits: weighted mean of identical per-element CE = log 7
        np.testing.assert_allclose(float(l0), np.log(7), rtol=1e-5)
        np.testing.assert_allclose(float(l1), np.log(7), rtol=1e-5)

    def test_ignore_padding(self):
        logits = jnp.zeros((1, 7, 3, 3))
        targets = jnp.full((1, 3, 3), EDGE_IGNORE, jnp.int32)
        targets = targets.at[0, 0, 0].set(1)
        loss = graph_loss(logits, targets)
        np.testing.assert_allclose(float(loss), np.log(7), rtol=1e-5)

    def test_all_ignored_is_finite(self):
        logits = jnp.zeros((1, 7, 2, 2))
        targets = jnp.full((1, 2, 2), EDGE_IGNORE, jnp.int32)
        assert np.isfinite(float(graph_loss(logits, targets)))


class TestSchedules:
    def test_cosine_warmup_shape(self):
        cfg = tiny_test_config()
        enc, dec = make_schedules(cfg, total_steps=100)
        lrs = [float(enc(i)) for i in range(100)]
        peak_idx = int(np.argmax(lrs))
        assert peak_idx <= max(int(100 * cfg.train.warmup_ratio), 1) + 1
        assert lrs[0] < lrs[peak_idx]
        assert lrs[-1] < lrs[peak_idx]


def _dummy_batch(cfg, tokenizers, batch, seq_len=16):
    rng = np.random.default_rng(0)
    s = cfg.data.input_size
    k = cfg.data.max_atoms
    refs = {}
    for fmt in cfg.data.formats:
        if fmt == "edges":
            continue
        v = len(tokenizers[fmt])
        labels = rng.integers(5, v, size=(batch, seq_len)).astype(np.int32)
        labels[:, 0] = 1
        labels[:, -1] = 2
        refs[fmt] = labels
    refs["atom_indices"] = np.zeros((batch, k), np.int32)
    edges = rng.integers(0, 7, size=(batch, k, k)).astype(np.int32)
    refs["edges"] = edges
    return {
        "images": rng.standard_normal((batch, s, s, 3), dtype=np.float32),
        "refs": refs,
    }


class TestShardedTrainStep:
    def test_one_step_decreases_with_lr(self):
        cfg = tiny_test_config()
        n = min(8, len(jax.devices()))
        mesh = make_mesh((n,), ("data",), jax.devices()[:n])
        tokenizers = get_tokenizer(cfg.data)
        model = MolNexTRModel(cfg, {f: len(t) for f, t in tokenizers.items()})
        batch = _dummy_batch(cfg, tokenizers, batch=2 * n)
        state = create_train_state(
            cfg, model, jax.random.PRNGKey(0), total_steps=50, sample_batch=batch
        )
        dev_batch = shard_batch(mesh, jax.tree_util.tree_map(jnp.asarray, batch))
        step = jit_train_step(model, Criterion(cfg.data.formats), mesh, dev_batch)
        losses = []
        for i in range(3):
            state, metrics = step(state, dev_batch, jax.random.PRNGKey(1))
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert int(state.step) == 3
        # same batch repeatedly: loss must drop
        assert losses[-1] < losses[0]

    def test_multi_step_dispatch_matches_single_steps(self):
        """One K-step scan dispatch must apply the same K updates as K
        single dispatches (dropout off -> bitwise-comparable params)."""
        import dataclasses

        from molnextr_tpu.parallel import shard_batch_group
        from molnextr_tpu.train.step import jit_multi_train_step

        cfg = tiny_test_config()
        cfg.decoder = dataclasses.replace(
            cfg.decoder, attn_dropout=0.0, hidden_dropout=0.0
        )
        cfg.encoder = dataclasses.replace(cfg.encoder, drop_path_rate=0.0)
        n = min(2, len(jax.devices()))
        mesh = make_mesh((n,), ("data",), jax.devices()[:n])
        tokenizers = get_tokenizer(cfg.data)
        model = MolNexTRModel(cfg, {f: len(t) for f, t in tokenizers.items()})
        crit = Criterion(cfg.data.formats)
        b1 = _dummy_batch(cfg, tokenizers, batch=2 * n)
        rng2 = np.random.default_rng(5)
        b2 = jax.tree_util.tree_map(
            lambda x: x
            if x.dtype != np.float32
            else x + rng2.standard_normal(x.shape).astype(np.float32) * 0.01,
            b1,
        )

        def fresh_state():
            return create_train_state(
                cfg, model, jax.random.PRNGKey(0), total_steps=50, sample_batch=b1
            )

        base_rng = jax.random.PRNGKey(3)
        # K single dispatches
        s_single = fresh_state()
        step = jit_train_step(model, crit, mesh, shard_batch(mesh, b1))
        losses_single = []
        for b in (b1, b2):
            s_single, m = step(s_single, shard_batch(mesh, b), base_rng)
            losses_single.append(float(m["loss"]))
        # one K=2 dispatch
        group = jax.tree_util.tree_map(lambda *xs: np.stack(xs), b1, b2)
        dev_group = shard_batch_group(mesh, group)
        multi = jit_multi_train_step(model, crit, mesh, dev_group)
        s_multi, m_multi = multi(fresh_state(), dev_group, base_rng)
        assert int(s_multi.step) == int(s_single.step) == 2
        np.testing.assert_allclose(
            float(m_multi["loss"]), np.mean(losses_single), rtol=1e-5
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4
            ),
            s_multi.params,
            s_single.params,
        )

    def test_uint8_wire_matches_host_normalized(self):
        """uint8 images + on-device normalize must equal the float32
        host-normalized path (the training wire format)."""
        import dataclasses

        from molnextr_tpu.data.transforms import (
            IMAGENET_MEAN, IMAGENET_STD,
        )

        cfg = tiny_test_config()
        cfg.decoder = dataclasses.replace(
            cfg.decoder, attn_dropout=0.0, hidden_dropout=0.0
        )
        cfg.encoder = dataclasses.replace(cfg.encoder, drop_path_rate=0.0)
        n = min(2, len(jax.devices()))
        mesh = make_mesh((n,), ("data",), jax.devices()[:n])
        tokenizers = get_tokenizer(cfg.data)
        model = MolNexTRModel(cfg, {f: len(t) for f, t in tokenizers.items()})
        crit = Criterion(cfg.data.formats)
        batch = _dummy_batch(cfg, tokenizers, batch=2 * n)
        rng = np.random.default_rng(7)
        raw = rng.integers(
            0, 256, size=batch["images"].shape, dtype=np.uint8
        )
        b_u8 = dict(batch, images=raw)
        b_f32 = dict(
            batch,
            images=((raw.astype(np.float32) / 255.0) - IMAGENET_MEAN)
            / IMAGENET_STD,
        )

        def run(b):
            state = create_train_state(
                cfg, model, jax.random.PRNGKey(0), total_steps=50,
                sample_batch=b,
            )
            step = jit_train_step(model, crit, mesh, shard_batch(mesh, b))
            _, m = step(state, shard_batch(mesh, b), jax.random.PRNGKey(1))
            return float(m["loss"])

        np.testing.assert_allclose(run(b_u8), run(b_f32), rtol=1e-5)

    def test_grayscale_wire_matches_3channel(self):
        """(B,H,W,1) uint8 wire + on-device broadcast-normalize must equal
        the same image replicated to 3 channels (the ToGray guarantee)."""
        import dataclasses

        cfg = tiny_test_config()
        cfg.decoder = dataclasses.replace(
            cfg.decoder, attn_dropout=0.0, hidden_dropout=0.0
        )
        cfg.encoder = dataclasses.replace(cfg.encoder, drop_path_rate=0.0)
        n = min(2, len(jax.devices()))
        mesh = make_mesh((n,), ("data",), jax.devices()[:n])
        tokenizers = get_tokenizer(cfg.data)
        model = MolNexTRModel(cfg, {f: len(t) for f, t in tokenizers.items()})
        crit = Criterion(cfg.data.formats)
        batch = _dummy_batch(cfg, tokenizers, batch=2 * n)
        rng = np.random.default_rng(11)
        gray = rng.integers(
            0, 256, size=batch["images"].shape[:-1] + (1,), dtype=np.uint8
        )
        b_1ch = dict(batch, images=gray)
        b_3ch = dict(batch, images=np.repeat(gray, 3, axis=-1))

        def run(b):
            state = create_train_state(
                cfg, model, jax.random.PRNGKey(0), total_steps=50,
                sample_batch=b,
            )
            step = jit_train_step(model, crit, mesh, shard_batch(mesh, b))
            _, m = step(state, shard_batch(mesh, b), jax.random.PRNGKey(1))
            return float(m["loss"])

        np.testing.assert_allclose(run(b_1ch), run(b_3ch), rtol=1e-5)

    def test_int8_label_wire_matches_int32(self):
        """int8 edges on the wire (EDGE_IGNORE=-100 fits) must produce the
        same loss as int32 labels — step._as_model_refs promotes on device."""
        cfg = tiny_test_config()
        n = min(2, len(jax.devices()))
        mesh = make_mesh((n,), ("data",), jax.devices()[:n])
        tokenizers = get_tokenizer(cfg.data)
        model = MolNexTRModel(cfg, {f: len(t) for f, t in tokenizers.items()})
        crit = Criterion(cfg.data.formats)
        batch = _dummy_batch(cfg, tokenizers, batch=2 * n)
        batch["refs"]["edges"][:, -1, :] = -100  # ignore rows survive int8
        b_i8 = dict(
            batch,
            refs=dict(batch["refs"], edges=batch["refs"]["edges"].astype(np.int8)),
        )

        def run(b):
            state = create_train_state(
                cfg, model, jax.random.PRNGKey(0), total_steps=50,
                sample_batch=b,
            )
            step = jit_train_step(model, crit, mesh, shard_batch(mesh, b))
            _, m = step(state, shard_batch(mesh, b), jax.random.PRNGKey(1))
            return float(m["loss"])

        np.testing.assert_allclose(run(b_i8), run(batch), rtol=1e-6)

    def test_sharded_matches_single_device(self):
        """Data-parallel gradient math must equal single-device math."""
        cfg = tiny_test_config()
        if len(jax.devices()) < 2:
            pytest.skip("needs >=2 devices")
        tokenizers = get_tokenizer(cfg.data)
        model = MolNexTRModel(cfg, {f: len(t) for f, t in tokenizers.items()})
        batch = _dummy_batch(cfg, tokenizers, batch=4)

        def run(n_dev):
            mesh = make_mesh((n_dev,), ("data",), jax.devices()[:n_dev])
            state = create_train_state(
                cfg, model, jax.random.PRNGKey(0), total_steps=50, sample_batch=batch
            )
            dev_batch = shard_batch(mesh, jax.tree_util.tree_map(jnp.asarray, batch))
            step = jit_train_step(model, Criterion(cfg.data.formats), mesh, dev_batch)
            state, metrics = step(state, dev_batch, jax.random.PRNGKey(7))
            return float(metrics["loss"])

        np.testing.assert_allclose(run(1), run(2), rtol=1e-5)


class TestDistributedHelpers:
    def test_single_process_noops(self):
        import numpy as np

        from molnextr_tpu.parallel import (
            barrier, gather_arrays, is_main_process, process_count,
        )

        assert process_count() == 1
        assert is_main_process()
        x = np.arange(6).reshape(2, 3)
        np.testing.assert_array_equal(gather_arrays(x), x)
        barrier()  # no-op, must not raise


class TestTensorParallel:
    def test_tp_matches_dp_loss(self):
        """2D (data x model) sharded step must compute the same loss as
        pure data-parallel."""
        import numpy as np

        if len(jax.devices()) < 4:
            pytest.skip("needs >= 4 devices")
        from molnextr_tpu.parallel.tp import shard_params
        cfg = tiny_test_config()
        tokenizers = get_tokenizer(cfg.data)
        model = MolNexTRModel(cfg, {f: len(t) for f, t in tokenizers.items()})
        batch = _dummy_batch(cfg, tokenizers, batch=4)

        def run(mesh):
            state = create_train_state(
                cfg, model, jax.random.PRNGKey(0), total_steps=50, sample_batch=batch
            )
            if "model" in mesh.axis_names:
                state = state.replace(params=shard_params(state.params, mesh))
            dev_batch = shard_batch(mesh, jax.tree_util.tree_map(jnp.asarray, batch))
            step = jit_train_step(model, Criterion(cfg.data.formats), mesh, dev_batch)
            state, metrics = step(state, dev_batch, jax.random.PRNGKey(7))
            return float(metrics["loss"])

        dp = run(make_mesh((4,), ("data",), jax.devices()[:4]))
        tp = run(make_mesh((2, 2), ("data", "model"), jax.devices()[:4]))
        np.testing.assert_allclose(dp, tp, rtol=1e-5)
