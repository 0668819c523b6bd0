"""Training losses for VALL-E X (AR + NAR), built the VALL-E-paper way.

The reference repo ships no runnable training loop (VALLE.forward raises
NotImplementedError, models/vallex.py:447-457; the README defers training to
lifeiteng/vall-e). This module provides the standard two-stage objective so
the framework is trainable end-to-end on TPU:

  AR: teacher-forced next-token cross-entropy over codebook 0 with the
      BOS-prepend / EOS-append convention of `pad_y_eos`
      (reference: models/vallex.py:294-305).
  NAR: one uniformly-sampled stage j ∈ [1,7] per step; the acoustic-prompt
      construction follows the reference's `_prepare_prompts`
      (models/vallex.py:307-365) for every prefix_mode it defines:

      mode 0 — no prompt: the running embedding sums codebooks < j over the
          whole utterance; loss on codebook j over all valid frames.
      mode 1 — prefix-at-beginning (the shipped checkpoint's mode): a random
          prefix of the SAME utterance (len ~ U[0, 2·⌊len/4⌋) capped at 225)
          sums all 8 codebooks; the suffix sums codebooks < j; loss over the
          suffix only.
      mode 2 — random window prompt: a min(225, ⌊min_len/4⌋)-frame window at
          a per-utterance random start is PREPENDED (all 8 codebooks); the
          target frames inside that window are dropped from the loss (the
          reference overwrites their codebook-j code with NUM_AUDIO_TOKENS,
          its CE ignore_index); loss over the remaining valid frames.
      mode 4 — dataset-provided prompt (PromptedFeatures): prompt codes
          [B, P, 8] are prepended (all 8 codebooks); loss over all valid
          frames of the utterance.

Everything is fixed-shape and mask-based so one jit covers a whole bucket:
mode 2's variable window lives in a static 225-frame buffer with the tail
masked, and the prepended-prompt modes apply the positional embedding in two
offset slices so frame positions match the reference's contiguous concat.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models import layers as L
from ..models import vallex as V

Params = Dict[str, Any]


def _ce(logits: jnp.ndarray, targets: jnp.ndarray, mask: jnp.ndarray):
    """Masked mean cross-entropy. logits [..., V] fp32."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    total = jnp.sum(nll * mask)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return total / count


def _ceil128(n: int) -> int:
    return -(-n // 128) * 128


def _flash_friendly(total: int) -> int:
    """Smallest multiple of 128 ≥ total whose 128-block count is divisible
    by 2, 3 or 4 — so attention_core_flash can tile with ≥256-wide blocks.
    With prime block counts (e.g. 1408 = 11·128) the kernel degrades to
    128-wide blocks, where per-block overhead dominates the whole pass."""
    n = _ceil128(total)
    while (n // 128) % 4 and (n // 128) % 3 and (n // 128) % 2:
        n += 128
    return n


def _pad_to(x: jnp.ndarray, length: int, axis: int = 1) -> jnp.ndarray:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, length - x.shape[axis])
    return jnp.pad(x, pad)


def ar_loss(
    params: Params,
    cfg: ModelConfig,
    text_ids: jnp.ndarray,  # [B, S]
    lang_ids: jnp.ndarray,  # [B, S]
    text_lens: jnp.ndarray,  # [B]
    audio_cb0: jnp.ndarray,  # [B, T] codebook-0 tokens
    audio_lens: jnp.ndarray,  # [B]
    pe_table: jnp.ndarray,
    dtype=jnp.bfloat16,
    use_flash: bool = False,
    remat: bool = True,
) -> jnp.ndarray:
    B, S = text_ids.shape
    T = audio_cb0.shape[1]
    eos, bos = cfg.eos_id, cfg.bos_id

    # pad_y_eos: inputs = [BOS, y]; targets = [y, EOS@len]
    y_in = jnp.concatenate(
        [jnp.full((B, 1), bos, audio_cb0.dtype), audio_cb0], axis=1
    )  # [B, T+1]
    pos_t = jnp.arange(T + 1)[None]
    targets = jnp.where(
        pos_t < audio_lens[:, None],
        jnp.concatenate([audio_cb0, jnp.zeros((B, 1), audio_cb0.dtype)], 1),
        eos,
    )  # y then EOS at position len (later positions also EOS, masked out)

    x = V.text_input(params, cfg, text_ids, lang_ids, "ar", pe_table, dtype)
    y_emb = V.ar_audio_input(params, cfg, y_in, pe_table, 0, dtype)
    loss_mask = (pos_t <= audio_lens[:, None]).astype(jnp.float32)

    if use_flash:
        # prefix-causal Pallas flash path: pad the text and audio regions
        # independently to multiples of 128 (flash block granularity; the
        # regions carry their own positional embeddings, so the inserted
        # padding is invisible outside the segment masks)
        S2 = _ceil128(S)
        T2 = _flash_friendly(S2 + _ceil128(T + 1)) - S2
        xy = jnp.concatenate([_pad_to(x, S2), _pad_to(y_emb, T2)], axis=1)
        text_seg = (jnp.arange(S2)[None] < text_lens[:, None]).astype(
            jnp.int32
        )
        audio_seg = jnp.logical_and(
            jnp.arange(T2)[None] <= audio_lens[:, None],
            jnp.arange(T2)[None] < T + 1,
        ).astype(jnp.int32)
        seg = jnp.concatenate([text_seg, audio_seg], axis=1)
        h = V.ar_forward(
            params, cfg, xy, None, remat=remat,
            segments=(seg, seg), prefix_flash=S2,
        )
        logits = V.ar_logits(params, h[:, S2 : S2 + T + 1])
        return _ce(logits, targets.astype(jnp.int32), loss_mask)

    xy = jnp.concatenate([x, y_emb], axis=1)  # [B, S+T+1]
    total = S + T + 1
    rows = jnp.arange(total)[None, :, None]
    cols = jnp.arange(total)[None, None, :]
    col_text_ok = cols < text_lens[:, None, None]
    col_audio_ok = jnp.logical_and(
        cols >= S, (cols - S) <= audio_lens[:, None, None]
    )
    causal = jnp.where(cols < S, True, cols <= rows)
    ok = jnp.logical_and(jnp.logical_or(col_text_ok, col_audio_ok), causal)
    mask = jnp.where(ok, 0.0, V.NEG_INF).astype(jnp.float32)[:, None]

    h = V.ar_forward(params, cfg, xy, mask, remat=remat)
    logits = V.ar_logits(params, h[:, S:])  # [B, T+1, 1025]
    return _ce(logits, targets.astype(jnp.int32), loss_mask)


PROMPT_FRAMES = 225  # 24000/320 · 3 s (reference: models/vallex.py:323)


def _sum_codebook_embs(emb, codes, upto, dtype):
    """Σ_{1≤j<upto} emb[j][codes[..., j]] added to emb[0][codes[..., 0]].

    `upto` may be a traced scalar (per-step sampled stage) or
    cfg.num_quantizers for an all-codebooks prompt sum.
    """
    y = jnp.take(emb[0], codes[..., 0], axis=0).astype(dtype)
    for j in range(1, codes.shape[-1]):
        ej = jnp.take(emb[j], codes[..., j], axis=0).astype(dtype)
        y = y + ej * jnp.where(j < upto, 1.0, 0.0).astype(dtype)
    return y


def nar_prepare(
    params: Params,
    cfg: ModelConfig,
    codes: jnp.ndarray,  # [B, T, 8]
    audio_lens: jnp.ndarray,  # [B]
    stage: jnp.ndarray,  # [] int in [1, 7]
    prefix_len: jnp.ndarray,  # [] int (mode 1: sampled ≤ 225; mode 2: batch window len)
    pe_table: jnp.ndarray,
    prefix_mode: int = 1,
    prompt_codes: jnp.ndarray | None = None,  # [B, P, 8] (mode 4)
    prompt_starts: jnp.ndarray | None = None,  # [B] (mode 2 window starts)
    dtype=jnp.bfloat16,
):
    """Audio-side inputs for one NAR training pass, per prefix_mode.

    Reimplements the reference's `_prepare_prompts`
    (models/vallex.py:307-365) with static shapes: prepended prompts live in
    a fixed-width buffer (mode 2: 225 frames; mode 4: prompt_codes.shape[1])
    whose invalid tail is masked, and the positional embedding is applied in
    two slices (prompt at offset 0, utterance at offset prefix_len) so frame
    positions match the reference's contiguous torch.concat.

    Returns (y_pos [B, L, D], col_valid [B, L] bool, loss_mask [B, T] f32,
    targets [B, T] int32, y_start int) where L = T (modes 0/1) or
    P + T (modes 2/4) and logits are taken from h[:, S+y_start:].
    """
    B, T = codes.shape[:2]
    emb = params["nar_audio_embeddings"]["weight"]  # [8, 1025, D]
    alpha = params["nar_audio_position"]["alpha"]

    pos_t = jnp.arange(T)[None, :, None]  # [1, T, 1]
    valid = pos_t < audio_lens[:, None, None]
    targets = jnp.take_along_axis(
        codes, jnp.broadcast_to(stage, (B, T, 1)).astype(jnp.int32), axis=-1
    )[..., 0].astype(jnp.int32)

    if prefix_mode == 0:
        # no prompt: codebooks < stage everywhere; loss on every valid frame
        y_emb = _sum_codebook_embs(emb, codes, stage, dtype)
        y_emb = y_emb * valid.astype(dtype)
        y_pos = L.sine_pe_apply(pe_table, alpha, y_emb)
        loss_mask = valid[..., 0].astype(jnp.float32)
        return y_pos, valid[..., 0], loss_mask, targets, 0

    if prefix_mode == 1:
        # prefix-at-beginning: first prefix_len frames sum ALL codebooks,
        # the suffix sums codebooks < stage; loss over the suffix
        in_prefix = pos_t < prefix_len
        y_emb = jnp.take(emb[0], codes[..., 0], axis=0).astype(dtype)
        for j in range(1, cfg.num_quantizers):
            ej = jnp.take(emb[j], codes[..., j], axis=0).astype(dtype)
            add = jnp.where(in_prefix, 1.0, 0.0) + jnp.where(
                jnp.logical_and(~in_prefix, j < stage), 1.0, 0.0
            )
            y_emb = y_emb + ej * add.astype(dtype)
        y_emb = y_emb * valid.astype(dtype)
        y_pos = L.sine_pe_apply(pe_table, alpha, y_emb)
        loss_mask = jnp.logical_and(~in_prefix[..., 0], valid[..., 0]).astype(
            jnp.float32
        )
        return y_pos, valid[..., 0], loss_mask, targets, 0

    if prefix_mode == 2:
        # random-window prompt, prepended: window [start_b, start_b+prefix_len)
        # of the SAME utterance sums all 8 codebooks; the window's frames are
        # dropped from the loss (reference sets their codebook-`stage` code
        # to NUM_AUDIO_TOKENS, its CE ignore_index)
        P = min(PROMPT_FRAMES, T)  # window len ≤ min_len/4 < T always
        assert prompt_starts is not None, "mode 2 needs per-utterance starts"
        # pad the time axis so dynamic_slice never clamps a legitimate start
        # (only the first prefix_len ≤ len_b − start frames are ever valid)
        padded = jnp.pad(codes, ((0, 0), (0, P), (0, 0)))
        window = jax.vmap(
            lambda c, s: jax.lax.dynamic_slice_in_dim(c, s, P, axis=0)
        )(padded, prompt_starts)  # [B, P, 8]
        prompt_emb = _sum_codebook_embs(
            emb, window, cfg.num_quantizers, dtype
        )
        pos_p = jnp.arange(P)[None, :, None]
        prompt_valid = pos_p < prefix_len
        prompt_emb = prompt_emb * prompt_valid.astype(dtype)
        prompt_pos = L.sine_pe_apply(pe_table, alpha, prompt_emb)

        y_emb = _sum_codebook_embs(emb, codes, stage, dtype)
        y_emb = y_emb * valid.astype(dtype)
        y_pos = L.sine_pe_apply(pe_table, alpha, y_emb, offset=prefix_len)

        full = jnp.concatenate([prompt_pos, y_pos], axis=1)  # [B, P+T, D]
        col_valid = jnp.concatenate(
            [
                jnp.broadcast_to(prompt_valid[..., 0], (B, P)),
                valid[..., 0],
            ],
            axis=1,
        )
        in_window = jnp.logical_and(
            pos_t[..., 0] >= prompt_starts[:, None],
            pos_t[..., 0] < prompt_starts[:, None] + prefix_len,
        )
        loss_mask = jnp.logical_and(valid[..., 0], ~in_window).astype(
            jnp.float32
        )
        return full, col_valid, loss_mask, targets, P

    if prefix_mode == 4:
        # dataset-provided prompt (PromptedFeatures), prepended whole; loss
        # over every valid frame of the utterance
        assert prompt_codes is not None, "mode 4 needs prompt_codes [B,P,8]"
        P = prompt_codes.shape[1]
        prompt_emb = _sum_codebook_embs(
            emb, prompt_codes, cfg.num_quantizers, dtype
        )
        prompt_pos = L.sine_pe_apply(pe_table, alpha, prompt_emb)

        y_emb = _sum_codebook_embs(emb, codes, stage, dtype)
        y_emb = y_emb * valid.astype(dtype)
        y_pos = L.sine_pe_apply(pe_table, alpha, y_emb, offset=P)

        full = jnp.concatenate([prompt_pos, y_pos], axis=1)
        col_valid = jnp.concatenate(
            [jnp.ones((B, P), bool), valid[..., 0]], axis=1
        )
        loss_mask = valid[..., 0].astype(jnp.float32)
        return full, col_valid, loss_mask, targets, P

    raise ValueError(f"prefix_mode must be 0/1/2/4, got {prefix_mode}")


def nar_loss(
    params: Params,
    cfg: ModelConfig,
    text_ids: jnp.ndarray,  # [B, S]
    lang_ids: jnp.ndarray,
    text_lens: jnp.ndarray,
    codes: jnp.ndarray,  # [B, T, 8]
    audio_lens: jnp.ndarray,  # [B]
    stage: jnp.ndarray,  # [] int in [1, 7] (sampled by the caller)
    prefix_len: jnp.ndarray,  # [] int (sampled by the caller, ≤ 225)
    pe_table: jnp.ndarray,
    dtype=jnp.bfloat16,
    prefix_mode: int = 1,
    prompt_codes: jnp.ndarray | None = None,
    prompt_starts: jnp.ndarray | None = None,
    use_flash: bool = False,
    remat: bool = True,
) -> jnp.ndarray:
    B, S = text_ids.shape
    T = codes.shape[1]

    x = V.text_input(params, cfg, text_ids, lang_ids, "nar", pe_table, dtype)
    y_pos, col_valid, loss_mask, targets, y_start = nar_prepare(
        params, cfg, codes, audio_lens, stage, prefix_len, pe_table,
        prefix_mode, prompt_codes, prompt_starts, dtype,
    )
    text_valid = jnp.arange(S)[None, :] < text_lens[:, None]

    if use_flash:
        # the NAR mask is pure key padding — exactly what flash segment ids
        # express; pad regions independently to the 128 block granularity
        S2 = _ceil128(S)
        L2 = _flash_friendly(S2 + _ceil128(y_pos.shape[1])) - S2
        xy = jnp.concatenate([_pad_to(x, S2), _pad_to(y_pos, L2)], axis=1)
        seg = jnp.concatenate(
            [_pad_to(text_valid, S2), _pad_to(col_valid, L2)], axis=1
        ).astype(jnp.int32)
        h = V.nar_forward_stage(
            params, cfg, xy, stage - 1, None, segments=(seg, seg),
            remat=remat,
        )
        h_y = h[:, S2 + y_start : S2 + y_start + T]
        logits = V.nar_logits(params, h_y, stage - 1)
        return _ce(logits, targets, loss_mask)

    xy = jnp.concatenate([x, y_pos], axis=1)
    ok = jnp.concatenate([text_valid, col_valid], axis=1)
    mask = jnp.where(ok, 0.0, V.NEG_INF).astype(jnp.float32)[:, None, None, :]

    h = V.nar_forward_stage(params, cfg, xy, stage - 1, mask, remat=remat)
    logits = V.nar_logits(params, h[:, S + y_start :], stage - 1)  # [B,T,1024]
    return _ce(logits, targets, loss_mask)


def sample_nar_prompt(
    rng: jax.Array,
    audio_lens: jnp.ndarray,
    prefix_mode: int,
) -> Tuple[jnp.ndarray, jnp.ndarray | None]:
    """(prefix_len, prompt_starts) per the reference's samplers.

    mode 1: prefix_len ~ U[0, 2·⌊0.25·min_len⌋) then capped at 225
            (reference: models/vallex.py:321-323, torch.randint upper-excl).
    mode 2: prefix_len = min(225, ⌊0.25·min_len⌋) deterministic; per-
            utterance window start ~ U[0, len_b − prefix_len] inclusive
            (reference: models/vallex.py:339-342, random.Random.randint).
    """
    r_len, r_start = jax.random.split(rng)
    min_len = jnp.min(audio_lens).astype(jnp.int32)
    if prefix_mode == 1:
        int_low = min_len // 4
        prefix_len = jax.random.randint(
            r_len, (), 0, jnp.maximum(int_low * 2, 1)
        )
        return jnp.minimum(prefix_len, PROMPT_FRAMES), None
    if prefix_mode == 2:
        prefix_len = jnp.minimum(min_len // 4, PROMPT_FRAMES)
        starts = jax.random.randint(
            r_start,
            (audio_lens.shape[0],),
            0,
            jnp.maximum(audio_lens - prefix_len + 1, 1),
        )
        return prefix_len, starts
    return jnp.zeros((), jnp.int32), None  # modes 0/4: no sampling


def total_loss(
    params: Params,
    cfg: ModelConfig,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    dtype=jnp.bfloat16,
    prefix_mode: int = 1,
    use_flash: bool | str = False,
    remat: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Combined AR + NAR objective over a collated batch.

    prefix_mode selects the NAR acoustic-prompt construction (0/1/2/4,
    reference models/vallex.py:307-365). Mode 4 reads the dataset-provided
    prompt from batch["prompt_codes"] ([B, P, 8], PromptedFeatures).
    use_flash routes both forwards through the Pallas flash-attention
    kernels (TPU fast path; identical math up to fold order)."""
    if use_flash == "auto":
        # measured crossover (PERFORMANCE.md): the Pallas flash kernels beat
        # the materialized-mask path once the quadratic score tensor is big
        # enough; below it the mask path's smaller padding wins
        use_flash = batch["codes"].shape[1] >= 800
    pe = L.make_sine_pe(cfg.max_position, cfg.d_model)
    r1, r2 = jax.random.split(rng)
    stage = jax.random.randint(r1, (), 1, cfg.num_quantizers)
    prefix_len, prompt_starts = sample_nar_prompt(
        r2, batch["audio_lens"], prefix_mode
    )

    l_ar = ar_loss(
        params, cfg,
        batch["text_ids"], batch["lang_ids"], batch["text_lens"],
        batch["codes"][..., 0], batch["audio_lens"], pe, dtype,
        use_flash=use_flash, remat=remat,
    )
    l_nar = nar_loss(
        params, cfg,
        batch["text_ids"], batch["lang_ids"], batch["text_lens"],
        batch["codes"], batch["audio_lens"], stage, prefix_len, pe, dtype,
        prefix_mode=prefix_mode,
        prompt_codes=batch.get("prompt_codes") if prefix_mode == 4 else None,
        prompt_starts=prompt_starts,
        use_flash=use_flash, remat=remat,
    )
    loss = l_ar + l_nar
    return loss, {"loss": loss, "ar_loss": l_ar, "nar_loss": l_nar}

# ---------------------------------------------------------------------------
# Sequence-packed training (round 5): multiple utterances share one batch
# row, back-to-back, with per-token position ids (PE restarts inside each
# utterance) and per-token segment ids (the flash kernels' segment masks
# keep attention within each utterance). Short utterances stop wasting the
# static bucket's padded FLOPs — the quadratic attention and all matmuls
# run over real tokens plus only the per-row tail. Packed layout per row:
# text region [text_1 | text_2 | … | pad] (the flash PREFIX block — every
# utterance's text is bidirectional within its segment), then audio region
# [BOS y_1 | BOS y_2 | … | pad] (causal; an utterance's audio attends its
# own text through the segment match). The collate
# (data/dataset.py::collate with pack>1) builds all per-token arrays on
# the host.
# ---------------------------------------------------------------------------


def _packed_input(params, stack, ids, lang_ids, pos, pe_table, dtype):
    """Token emb (+ language emb) + alpha·PE[pos] with PER-TOKEN positions
    (text_input/ar_audio_input take a scalar offset; packed rows restart
    positions at each utterance boundary)."""
    if stack in ("ar_text", "nar_text"):
        s = stack.split("_")[0]
        x = L.embedding_apply(params[f"{s}_text_embedding"], ids, dtype)
        x = x + L.embedding_apply(
            params[f"{s}_language_embedding"], lang_ids, dtype
        )
        alpha = params[f"{s}_text_position"]["alpha"]
    else:  # "ar_audio"
        x = L.embedding_apply(params["ar_audio_embedding"], ids, dtype)
        alpha = params["ar_audio_position"]["alpha"]
    pe = jnp.take(pe_table, pos, axis=0).astype(x.dtype)
    return x + (alpha * pe).astype(x.dtype)


def ar_loss_packed(
    params: Params,
    cfg: ModelConfig,
    batch: Dict[str, jnp.ndarray],
    pe_table: jnp.ndarray,
    dtype=jnp.bfloat16,
    remat: bool = True,
) -> jnp.ndarray:
    """AR loss over a PACKED batch (see module comment). Flash-only: the
    segment masks are how the packing is expressed. Expects the collate's
    packed fields: p_text_ids/p_lang_ids/p_text_pos/p_text_seg [B, Ws],
    p_audio_in/p_audio_pos/p_audio_seg/p_targets [B, Wa],
    p_loss_mask [B, Wa] (targets already carry the per-utterance EOS)."""
    x = _packed_input(
        params, "ar_text", batch["p_text_ids"], batch["p_lang_ids"],
        batch["p_text_pos"], pe_table, dtype,
    )
    y = _packed_input(
        params, "ar_audio", batch["p_audio_in"], None,
        batch["p_audio_pos"], pe_table, dtype,
    )
    Ws = x.shape[1]
    xy = jnp.concatenate([x, y], axis=1)
    seg = jnp.concatenate(
        [batch["p_text_seg"], batch["p_audio_seg"]], axis=1
    ).astype(jnp.int32)
    h = V.ar_forward(
        params, cfg, xy, None, remat=remat,
        segments=(seg, seg), prefix_flash=Ws,
    )
    logits = V.ar_logits(params, h[:, Ws:])
    return _ce(
        logits, batch["p_targets"].astype(jnp.int32),
        batch["p_loss_mask"].astype(jnp.float32),
    )


def nar_loss_packed(
    params: Params,
    cfg: ModelConfig,
    batch: Dict[str, jnp.ndarray],
    stage: jnp.ndarray,  # [] int in [1, 7]
    prefix_len: jnp.ndarray,  # [] int (mode 1; 0 for mode 0)
    pe_table: jnp.ndarray,
    dtype=jnp.bfloat16,
    prefix_mode: int = 1,
    remat: bool = True,
) -> jnp.ndarray:
    """NAR loss over a PACKED batch, prefix modes 0/1 (the per-utterance
    constructions are per-token: in_prefix by position id, validity by
    segment id — modes 2/4 prepend prompt buffers and stay unpacked).
    Packed codes: p_codes [B, Wa, 8], positions p_codes_pos [B, Wa],
    segments p_codes_seg [B, Wa]."""
    assert prefix_mode in (0, 1), "packed NAR supports prefix modes 0/1"
    codes = batch["p_codes"]
    pos = batch["p_codes_pos"]
    seg = batch["p_codes_seg"]
    valid = (seg > 0)[..., None]
    emb = params["nar_audio_embeddings"]["weight"]
    alpha = params["nar_audio_position"]["alpha"]

    targets = jnp.take_along_axis(
        codes,
        jnp.broadcast_to(stage, codes.shape[:2] + (1,)).astype(jnp.int32),
        axis=-1,
    )[..., 0].astype(jnp.int32)

    if prefix_mode == 0:
        y_emb = _sum_codebook_embs(emb, codes, stage, dtype)
        loss_mask = valid[..., 0].astype(jnp.float32)
    else:
        in_prefix = (pos < prefix_len)[..., None]
        y_emb = jnp.take(emb[0], codes[..., 0], axis=0).astype(dtype)
        for j in range(1, cfg.num_quantizers):
            ej = jnp.take(emb[j], codes[..., j], axis=0).astype(dtype)
            add = jnp.where(in_prefix, 1.0, 0.0) + jnp.where(
                jnp.logical_and(~in_prefix, j < stage), 1.0, 0.0
            )
            y_emb = y_emb + ej * add.astype(dtype)
        loss_mask = jnp.logical_and(
            ~in_prefix[..., 0], valid[..., 0]
        ).astype(jnp.float32)
    y_emb = y_emb * valid.astype(dtype)
    pe = jnp.take(pe_table, pos, axis=0).astype(y_emb.dtype)
    y_pos = y_emb + (alpha * pe).astype(y_emb.dtype)

    x = _packed_input(
        params, "nar_text", batch["p_text_ids"], batch["p_lang_ids"],
        batch["p_text_pos"], pe_table, dtype,
    )
    Ws = x.shape[1]
    xy = jnp.concatenate([x, y_pos], axis=1)
    seg_full = jnp.concatenate(
        [batch["p_text_seg"], seg], axis=1
    ).astype(jnp.int32)
    h = V.nar_forward_stage(
        params, cfg, xy, stage - 1, None, segments=(seg_full, seg_full),
        remat=remat,
    )
    logits = V.nar_logits(params, h[:, Ws:], stage - 1)
    return _ce(logits, targets, loss_mask)


def total_loss_packed(
    params: Params,
    cfg: ModelConfig,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    dtype=jnp.bfloat16,
    prefix_mode: int = 1,
    remat: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Combined AR + NAR objective over a PACKED batch (flash kernels;
    collate(..., pack=K) builds the per-token arrays). The NAR prefix
    length samples from the minimum REAL utterance length, exactly like
    the unpacked sampler."""
    pe = L.make_sine_pe(cfg.max_position, cfg.d_model)
    r1, r2 = jax.random.split(rng)
    stage = jax.random.randint(r1, (), 1, cfg.num_quantizers)
    prefix_len, _ = sample_nar_prompt(r2, batch["audio_lens"], prefix_mode)
    l_ar = ar_loss_packed(params, cfg, batch, pe, dtype, remat=remat)
    l_nar = nar_loss_packed(
        params, cfg, batch, stage, prefix_len, pe, dtype,
        prefix_mode=prefix_mode, remat=remat,
    )
    loss = l_ar + l_nar
    return loss, {"loss": loss, "ar_loss": l_ar, "nar_loss": l_nar}


def debug_activations(
    params: Params,
    cfg: ModelConfig,
    batch: Dict[str, jnp.ndarray],
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (text-region hidden [B,S,D], audio-region hidden [B,T,D]) from a
    teacher-forced AR pass, for the training visualizer (the reference
    dumps encoder/decoder heatmaps, models/visualizer.py:26-106; VALL-E is
    decoder-only, so the text/audio halves of the sequence play those
    roles)."""
    pe = L.make_sine_pe(cfg.max_position, cfg.d_model)
    text_ids, lang_ids = batch["text_ids"], batch["lang_ids"]
    B, S = text_ids.shape
    audio_cb0 = batch["codes"][..., 0]
    x = V.text_input(params, cfg, text_ids, lang_ids, "ar", pe, dtype)
    y = V.ar_audio_input(params, cfg, audio_cb0, pe, 0, dtype)
    xy = jnp.concatenate([x, y], axis=1)
    total = xy.shape[1]
    rows = jnp.arange(total)[None, :, None]
    cols = jnp.arange(total)[None, None, :]
    causal = jnp.where(cols < S, True, cols <= rows)
    mask = jnp.where(causal, 0.0, V.NEG_INF).astype(jnp.float32)[:, None]
    h = V.ar_forward(params, cfg, xy, mask)
    return h[:, :S], h[:, S:]
