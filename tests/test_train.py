"""Training-path tests: losses, train step, two-stage masking."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vallex_tpu.config import ModelConfig

TINY = ModelConfig(
    d_model=64, num_heads=4, num_layers=2, ffn_dim=128, max_position=256
)


def _batch(B=2, S=12, T=24):
    rng = np.random.RandomState(0)
    return {
        "text_ids": jnp.asarray(rng.randint(5, 99, (B, S)), jnp.int32),
        "lang_ids": jnp.zeros((B, S), jnp.int32),
        "text_lens": jnp.asarray([S, S - 3], jnp.int32),
        "codes": jnp.asarray(rng.randint(0, 1024, (B, T, 8)), jnp.int32),
        "audio_lens": jnp.asarray([T, T - 6], jnp.int32),
    }


@pytest.mark.slow
def test_total_loss_finite_and_near_uniform():
    from vallex_tpu.models.vallex import init_vallex
    from vallex_tpu.train.loss import total_loss

    params = init_vallex(jax.random.PRNGKey(0), TINY)
    loss, metrics = total_loss(
        params, TINY, _batch(), jax.random.PRNGKey(1), jnp.float32
    )
    assert np.isfinite(float(loss))
    # sane CE magnitudes for a random model (NAR sums up to 8 N(0,1)
    # embedding tables, so its logit variance — and CE — runs higher)
    assert 4.0 < float(metrics["ar_loss"]) < 15.0
    assert 4.0 < float(metrics["nar_loss"]) < 40.0


@pytest.mark.slow
def test_train_step_reduces_loss():
    from vallex_tpu.models.vallex import init_vallex
    from vallex_tpu.train.step import (
        init_train_state, make_optimizer, train_step,
    )

    params = init_vallex(jax.random.PRNGKey(0), TINY)
    opt = make_optimizer(base_lr=2e-3)
    state = init_train_state(params, opt)
    batch = _batch()
    losses = []
    for i in range(12):
        state, metrics = train_step(
            state, batch, jax.random.PRNGKey(42),  # fixed rng: same objective
            cfg=TINY, optimizer=opt, dtype="float32",
        )
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses  # overfits a fixed batch


@pytest.mark.slow
def test_two_stage_masking_freezes_other_stage():
    import optax

    from vallex_tpu.models.vallex import init_vallex, stage_param_labels
    from vallex_tpu.train.loss import total_loss

    params = init_vallex(jax.random.PRNGKey(0), TINY)
    labels = jax.tree.map(
        lambda b: "train" if b else "freeze", stage_param_labels(params, 1)
    )  # AR only
    opt = optax.multi_transform(
        {"train": optax.sgd(0.1), "freeze": optax.set_to_zero()}, labels
    )
    state = opt.init(params)
    grads = jax.grad(
        lambda p: total_loss(p, TINY, _batch(), jax.random.PRNGKey(1), jnp.float32)[0]
    )(params)
    updates, _ = opt.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    # nar params unchanged; ar params changed
    assert np.allclose(
        np.asarray(new["nar_text_embedding"]["weight"]),
        np.asarray(params["nar_text_embedding"]["weight"]),
    )
    assert not np.allclose(
        np.asarray(new["ar_text_embedding"]["weight"]),
        np.asarray(params["ar_text_embedding"]["weight"]),
    )


@pytest.mark.slow
def test_trainer_cli_end_to_end(tmp_path):
    """Full trainer driver: tiny model, synthetic HDF5 data, 1 epoch with
    ScaledAdam + stage-1 masking, orbax save, then --resume for epoch 2."""
    import h5py

    from vallex_tpu.train import trainer

    rng = np.random.RandomState(0)
    d = tmp_path / "data"
    d.mkdir()
    for split in ("train", "valid"):
        with h5py.File(str(d / f"{split}.hdf5"), "w") as f:
            for i in range(4):
                g = f.create_group(f"utt{i}")
                g.create_dataset(
                    "audio", data=rng.randint(0, 1024, (8, 24 + i))
                )
        with open(str(d / f"{split}.txt"), "w") as f:
            for i in range(4):
                f.write(f"utt{i}|{(24 + i) / 75:.2f}|en|tiny utterance {i}\n")

    argv = [
        "--data-dir", str(d), "--exp-dir", str(tmp_path / "exp"),
        "--num-epochs", "1", "--train-stage", "1",
        "--decoder-dim", "64", "--nhead", "4", "--num-decoder-layers", "2",
        "--dp", "2", "--tp", "1", "--log-interval", "1",
        "--diag-interval", "1", "--save-every", "1000",
        "--valid-interval", "1000", "--max-duration", "2.0",
        "--max-cut-duration", "2.0",
    ]
    args = trainer.get_parser().parse_args(argv)
    out = trainer.run(args)
    assert out["step"] >= 1
    assert np.isfinite(out["metrics"].get("loss", np.inf))

    ckpts = [p for p in (tmp_path / "exp").iterdir()
             if p.name.startswith("state-") and p.is_dir()]
    assert ckpts, "orbax checkpoint written at epoch end"

    viz = str(tmp_path / "viz")
    args2 = trainer.get_parser().parse_args(
        argv + ["--resume", "--valid-interval", "2",
                "--visualize-dir", viz]
    )
    args2.num_epochs = 2
    out2 = trainer.run(args2)
    assert out2["step"] > out["step"]
    import os

    assert any(f.endswith(".png") for f in os.listdir(viz))


def test_eve_callable_schedule_and_true_decay():
    """eve() used to crash with callable schedules (state[0].count on a
    non-chain state) and applied weight decay with the WRONG SIGN (weights
    grew by lr*decay*p every step instead of shrinking)."""
    import jax.numpy as jnp

    from vallex_tpu.train.scaled_adam import eden_schedule, eve

    opt = eve(eden_schedule(0.1, warmup=1.0), weight_decay=0.1,
              target_rms=0.1)
    p = {"w": jnp.full((4, 4), 0.5)}
    state = opt.init(p)
    g = {"w": jnp.zeros((4, 4))}
    updates, state = opt.update(g, state, p)  # crashes pre-fix
    import optax

    p2 = optax.apply_updates(p, updates)
    # zero gradient + weight decay must move weights TOWARD zero
    assert float(jnp.abs(p2["w"]).max()) < 0.5


def test_adamw_honors_warmup():
    from vallex_tpu.train.step import make_optimizer

    import jax.numpy as jnp

    short = make_optimizer(base_lr=1.0, warmup=2.0)
    long_ = make_optimizer(base_lr=1.0, warmup=2000.0)
    p = {"w": jnp.ones((2, 2))}
    g = {"w": jnp.ones((2, 2))}
    s1, s2 = short.init(p), long_.init(p)
    for _ in range(3):  # eden's ramp starts at 0.5 for ANY warmup; the
        u1, s1 = short.update(g, s1, p)  # schedules separate after a few
        u2, s2 = long_.update(g, s2, p)  # steps (short is fully ramped)
    assert float(jnp.abs(u2["w"]).max()) < float(jnp.abs(u1["w"]).max())


def test_prepend_bos_false_rejected():
    import pytest

    from vallex_tpu.config import ModelConfig

    with pytest.raises(ValueError, match="prepend_bos"):
        ModelConfig(prepend_bos=False)


# ---------------------------------------------------------------------------
# NAR prefix modes 0/1/2/4 — pinned against the reference's _prepare_prompts
# logic (models/vallex.py:307-365), reconstructed in-test in numpy.
# ---------------------------------------------------------------------------

def _np_sine_pe(max_len, dim):
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, dim, 2) * -(np.log(10000.0) / dim))
    pe = np.zeros((max_len, dim))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def _prepare_ref(emb, codes, audio_lens, stage, prefix_mode, prefix_len=0,
                 starts=None, prompt_codes=None):
    """Reference _prepare_prompts semantics in numpy: returns, per batch
    element, (concat embedding BEFORE masking/PE, loss-included frame set)."""
    B, T, Q = codes.shape

    def upto(c, lim):  # emb0[c0] + sum_{1<=j<lim} embj[cj]
        y = emb[0][c[..., 0]].copy()
        for j in range(1, lim):
            y += emb[j][c[..., j]]
        return y

    outs, losses = [], []
    for b in range(B):
        L_b = int(audio_lens[b])
        keep = np.arange(T) < L_b
        if prefix_mode == 0:
            y = upto(codes[b], stage)
            outs.append((np.zeros((0, emb.shape[-1])), y))
            losses.append(keep)
        elif prefix_mode == 1:
            pre = upto(codes[b, :prefix_len], Q)
            suf = upto(codes[b, prefix_len:], stage)
            outs.append((np.zeros((0, emb.shape[-1])),
                         np.concatenate([pre, suf], 0)))
            losses.append(keep & (np.arange(T) >= prefix_len))
        elif prefix_mode == 2:
            s = int(starts[b])
            win = codes[b, s:s + prefix_len]
            outs.append((upto(win, Q), upto(codes[b], stage)))
            in_win = (np.arange(T) >= s) & (np.arange(T) < s + prefix_len)
            losses.append(keep & ~in_win)
        elif prefix_mode == 4:
            outs.append((upto(prompt_codes[b], Q), upto(codes[b], stage)))
            losses.append(keep)
    return outs, losses


@pytest.mark.parametrize("mode", [0, 1, 2, 4])
def test_nar_prepare_matches_reference_semantics(mode):
    from vallex_tpu.models import layers as L
    from vallex_tpu.models.vallex import init_vallex
    from vallex_tpu.train.loss import nar_prepare

    params = init_vallex(jax.random.PRNGKey(0), TINY)
    rng = np.random.RandomState(3)
    B, T, Q = 2, 24, 8
    codes = rng.randint(0, 1024, (B, T, Q)).astype(np.int32)
    audio_lens = np.array([T, T - 6], np.int32)
    stage = 3
    prefix_len = {0: 0, 1: 5, 2: 4, 4: 0}[mode]
    starts = np.array([2, 7], np.int32) if mode == 2 else None
    prompt_codes = (
        rng.randint(0, 1024, (B, 6, Q)).astype(np.int32) if mode == 4 else None
    )

    pe = L.make_sine_pe(TINY.max_position, TINY.d_model)
    y_pos, col_valid, loss_mask, targets, y_start = jax.tree.map(
        np.asarray,
        nar_prepare(
            params, TINY, jnp.asarray(codes), jnp.asarray(audio_lens),
            jnp.asarray(stage), jnp.asarray(prefix_len), pe,
            prefix_mode=mode,
            prompt_codes=(None if prompt_codes is None
                          else jnp.asarray(prompt_codes)),
            prompt_starts=None if starts is None else jnp.asarray(starts),
            dtype=jnp.float32,
        ),
    )

    emb = np.asarray(params["nar_audio_embeddings"]["weight"], np.float64)
    pe_np = _np_sine_pe(TINY.max_position, TINY.d_model)
    alpha = float(params["nar_audio_position"]["alpha"])
    outs, losses = _prepare_ref(
        emb, codes, audio_lens, stage, mode, prefix_len, starts, prompt_codes
    )

    if mode in (0, 1):
        assert y_start == 0 and y_pos.shape[1] == T
    else:
        assert y_start == y_pos.shape[1] - T

    for b in range(B):
        prompt_ref, y_ref = outs[b]
        # reference concat: [prompt; y] with contiguous positions, PE added
        concat = np.concatenate([prompt_ref, y_ref], 0)
        pos = np.arange(concat.shape[0])
        ref_with_pe = concat + alpha * pe_np[pos]
        # ours: prompt buffer slots < len(prompt_ref) + the T frames after
        # y_start; frames beyond audio_lens[b] are zero-masked (check valid)
        got_prompt = y_pos[b, : len(prompt_ref)]
        got_y = y_pos[b, y_start : y_start + int(audio_lens[b])]
        got = np.concatenate([got_prompt, got_y], 0)
        want = np.concatenate(
            [ref_with_pe[: len(prompt_ref)],
             ref_with_pe[len(prompt_ref) : len(prompt_ref) + int(audio_lens[b])]],
            0,
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
        # loss mask matches the reference's kept-frame set exactly
        np.testing.assert_array_equal(loss_mask[b] > 0.5, losses[b])
        # column validity: prompt tail + padded frames masked
        if y_start:
            assert not col_valid[b, len(prompt_ref) : y_start].any()
        assert col_valid[b, : len(prompt_ref)].all()
        assert (col_valid[b, y_start:] == (np.arange(T) < audio_lens[b])).all()
    # targets are codebook `stage` verbatim
    np.testing.assert_array_equal(targets, codes[..., stage])


@pytest.mark.slow
@pytest.mark.parametrize("mode", [0, 2, 4])
def test_total_loss_other_prefix_modes_train(mode):
    """Modes 0/2/4 produce finite losses and nonzero flowing gradients."""
    from vallex_tpu.models.vallex import init_vallex
    from vallex_tpu.train.loss import total_loss

    params = init_vallex(jax.random.PRNGKey(0), TINY)
    batch = _batch()
    if mode == 4:
        rng = np.random.RandomState(1)
        batch["prompt_codes"] = jnp.asarray(
            rng.randint(0, 1024, (2, 6, 8)), jnp.int32
        )
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: total_loss(
            p, TINY, batch, jax.random.PRNGKey(1), jnp.float32, mode
        ),
        has_aux=True,
    )(params)
    assert np.isfinite(float(loss))
    g = np.asarray(grads["nar_audio_embeddings"]["weight"])
    assert np.abs(g).sum() > 0


def test_mode2_window_sampler_in_bounds():
    """Per-utterance window starts stay within [0, len_b - prefix_len]
    (reference: random.Random.randint inclusive upper)."""
    from vallex_tpu.train.loss import sample_nar_prompt

    audio_lens = jnp.asarray([100, 40, 64], jnp.int32)
    hits_upper = False
    for seed in range(50):
        prefix_len, starts = sample_nar_prompt(
            jax.random.PRNGKey(seed), audio_lens, 2
        )
        assert int(prefix_len) == 10  # min(225, 40//4)
        s = np.asarray(starts)
        assert (s >= 0).all() and (s <= np.asarray(audio_lens) - 10).all()
        hits_upper |= bool((s == np.asarray(audio_lens) - 10).any())
    assert hits_upper  # inclusive upper bound is reachable


def test_mode1_sampler_matches_reference_distribution():
    """prefix_len ~ U[0, 2·⌊min/4⌋) then capped at 225
    (reference models/vallex.py:321-323)."""
    from vallex_tpu.train.loss import sample_nar_prompt

    audio_lens = jnp.asarray([600, 480], jnp.int32)  # min//4 = 120
    seen = set()
    for seed in range(200):
        prefix_len, starts = sample_nar_prompt(
            jax.random.PRNGKey(seed), audio_lens, 1
        )
        assert starts is None
        v = int(prefix_len)
        assert 0 <= v <= 225
        seen.add(v)
    assert max(seen) > 120  # upper range is 2·int_low (capped), not int_low


@pytest.mark.slow
def test_flash_training_paths_match_mask_paths():
    """use_flash=True (prefix-causal AR + padding-mask NAR through the
    Pallas flash kernels, interpret mode on CPU) reproduces the additive-
    mask paths' loss and gradients within fold-order tolerance."""
    import jax.experimental.pallas as _pl

    from vallex_tpu.models.vallex import init_vallex
    from vallex_tpu.train.loss import total_loss

    params = init_vallex(jax.random.PRNGKey(0), TINY)
    rng_np = np.random.RandomState(7)
    B, S, T = 2, 100, 120  # NOT flash-block-aligned: exercises the padding
    batch = {
        "text_ids": jnp.asarray(rng_np.randint(5, 99, (B, S)), jnp.int32),
        "lang_ids": jnp.zeros((B, S), jnp.int32),
        "text_lens": jnp.asarray([S, S - 13], jnp.int32),
        "codes": jnp.asarray(rng_np.randint(0, 1024, (B, T, 8)), jnp.int32),
        "audio_lens": jnp.asarray([T, T - 37], jnp.int32),
    }

    def run(flash):
        return jax.value_and_grad(
            lambda p: total_loss(
                p, TINY, batch, jax.random.PRNGKey(1), jnp.float32, 1, flash
            )[0]
        )(params)

    loss_mask_, grads_mask = run(False)

    orig = _pl.pallas_call
    _pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        loss_flash, grads_flash = run(True)
    finally:
        _pl.pallas_call = orig

    assert abs(float(loss_flash) - float(loss_mask_)) < 1e-3
    for gm, gf in zip(jax.tree.leaves(grads_mask), jax.tree.leaves(grads_flash)):
        np.testing.assert_allclose(
            np.asarray(gm), np.asarray(gf), rtol=2e-3, atol=2e-3
        )


@pytest.mark.slow
def test_packed_loss_matches_unpacked():
    """Sequence packing (collate_packed + total_loss_packed): the packed
    flash path reproduces the unpacked additive-mask path's loss over the
    SAME utterances within fold-order tolerance — packing changes the
    layout (per-token positions + segment masks), not the math."""
    import jax.experimental.pallas as _pl

    from vallex_tpu.data.dataset import collate_packed
    from vallex_tpu.models.vallex import init_vallex
    from vallex_tpu.train.loss import total_loss, total_loss_packed

    params = init_vallex(jax.random.PRNGKey(0), TINY)
    rng_np = np.random.RandomState(11)
    lens_t = [40, 23, 31, 17]
    lens_a = [60, 29, 44, 51]
    samples = []
    for i, (sl, al) in enumerate(zip(lens_t, lens_a)):
        samples.append({
            "utt_id": f"u{i}",
            "text_tokens": rng_np.randint(5, 99, (sl,)).astype(np.int32),
            "text_tokens_lens": sl,
            "language": 0,
            "audio_features": rng_np.randint(
                0, 1024, (8, al)
            ).astype(np.int32),
            "audio_features_lens": al,
        })

    packed = {
        k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
        for k, v in collate_packed(samples, pack=2).items()
    }
    # unpacked reference batch over the SAME utterances (mask path)
    S = max(lens_t)
    T = max(lens_a)
    B = len(samples)
    text_ids = np.full((B, S), 3, np.int32)
    codes = np.zeros((B, T, 8), np.int32)
    for i, s in enumerate(samples):
        text_ids[i, : lens_t[i]] = s["text_tokens"]
        codes[i, : lens_a[i]] = s["audio_features"].T
    unpacked = {
        "text_ids": jnp.asarray(text_ids),
        "lang_ids": jnp.zeros((B, S), jnp.int32),
        "text_lens": jnp.asarray(lens_t, jnp.int32),
        "codes": jnp.asarray(codes),
        "audio_lens": jnp.asarray(lens_a, jnp.int32),
    }

    loss_ref, _ = total_loss(
        params, TINY, unpacked, jax.random.PRNGKey(1), jnp.float32, 1, False
    )
    orig = _pl.pallas_call
    _pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        loss_packed, aux = total_loss_packed(
            params, TINY, packed, jax.random.PRNGKey(1), jnp.float32, 1
        )
    finally:
        _pl.pallas_call = orig
    assert abs(float(loss_packed) - float(loss_ref)) < 2e-3, (
        float(loss_packed), float(loss_ref),
    )


def test_collate_packed_layout():
    """Packed arrays: positions restart per utterance, segment ids
    separate utterances, the loss mask covers exactly len+1 AR tokens per
    utterance, and the row width is driven by packed sums (not pack x the
    longest utterance)."""
    from vallex_tpu.data.dataset import collate_packed

    rng = np.random.RandomState(3)
    lens = [100, 20, 90, 30]
    samples = [{
        "utt_id": f"u{i}",
        "text_tokens": rng.randint(5, 99, (10,)).astype(np.int32),
        "text_tokens_lens": 10,
        "language": 1,
        "audio_features": rng.randint(0, 1024, (8, al)).astype(np.int32),
        "audio_features_lens": al,
    } for i, al in enumerate(lens)]
    out = collate_packed(samples, pack=2)
    B, Wa = out["p_audio_in"].shape
    assert B == 2
    # longest-with-shortest pairing: both rows hold ~120 frames + BOS slots
    assert int(out["p_loss_mask"].sum()) == sum(lens) + len(lens)
    for r in range(B):
        seg = out["p_audio_seg"][r]
        for s_id in (1, 2):
            rows = np.where(seg == s_id)[0]
            assert len(rows) > 0
            # positions restart at 0 within each utterance
            assert out["p_audio_pos"][r, rows[0]] == 0
            assert (np.diff(out["p_audio_pos"][r, rows]) == 1).all()
    # real-frame accounting is per utterance
    assert sorted(out["audio_lens"].tolist()) == sorted(lens)


@pytest.mark.slow
def test_trainer_cli_packed(tmp_path):
    """Trainer driver with --pack 2: batches arrive sequence-packed
    (p_* arrays), train_step dispatches the packed objective through the
    interpret-mode flash kernels, loss is finite."""
    import jax.experimental.pallas as _pl
    import h5py

    from vallex_tpu.train import trainer

    rng = np.random.RandomState(0)
    d = tmp_path / "data"
    d.mkdir()
    for split in ("train", "valid"):
        with h5py.File(str(d / f"{split}.hdf5"), "w") as f:
            for i in range(4):
                g = f.create_group(f"utt{i}")
                g.create_dataset(
                    "audio", data=rng.randint(0, 1024, (8, 24 + 7 * i))
                )
        with open(str(d / f"{split}.txt"), "w") as f:
            for i in range(4):
                f.write(
                    f"utt{i}|{(24 + 7 * i) / 75:.2f}|en|tiny utterance {i}\n"
                )

    argv = [
        "--data-dir", str(d), "--exp-dir", str(tmp_path / "exp"),
        "--num-epochs", "1", "--train-stage", "0",
        "--decoder-dim", "64", "--nhead", "4", "--num-decoder-layers", "2",
        "--dp", "2", "--tp", "1", "--log-interval", "1",
        "--diag-interval", "1000", "--save-every", "1000",
        "--valid-interval", "1000", "--max-duration", "4.0",
        "--max-cut-duration", "2.0", "--pack", "2",
    ]
    args = trainer.get_parser().parse_args(argv)
    orig = _pl.pallas_call
    _pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        out = trainer.run(args)
    finally:
        _pl.pallas_call = orig
    assert out["step"] >= 1
    assert np.isfinite(out["metrics"].get("loss", np.inf))
