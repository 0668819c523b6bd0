"""Batch-parallel synthesis over a device mesh.

The reference's only concurrency is `best_of` beam batching on one GPU
(SURVEY.md §2.3). Here independent requests scale across chips: the batch
axis is sharded over the mesh's "dp" axis with shard_map, and every device
runs the full AR while_loop + 7-stage NAR for its own request — no
collectives inside, so devices proceed independently (a device whose
utterance ends early simply finishes its program sooner).

Params are replicated (150 M fits per chip); only the request tensors are
sharded. Works identically on a real multi-chip mesh and on the virtual
8-device CPU mesh used in tests.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EngineConfig, ModelConfig
from ..ops.decode_step import ABLK
from .ar import (
    ar_generate,
    ar_generate_batch,
    _bucket,
    prepare_packed_weights,
    single_request_gen_caps,
)
from .nar import nar_generate, nar_use_flash

Params = Dict[str, Any]


def make_chunked_synthesis(
    params: Params,
    cfg: ModelConfig,
    ecfg: EngineConfig,
    mesh: Mesh,
    *,
    s_text: int,
    p_audio: int,  # % ABLK == 0 (ar_generate_batch layout)
    t_gen: int,
    t_audio: int,
    per_chip: int,
):
    """Mesh-sharded synthesis with IN-CHIP batching: each device runs the
    multi-request batched engine (ar_generate_batch) over its own chunk of
    per_chip requests, so the fleet serves devices x per_chip concurrent
    streams — each chip pays its decode weight stream once per step for
    its whole chunk. Filtered sampling (top_k > 1 / 0 < top_p < 1) runs
    the in-kernel bisection filter.

    Returns fn(text [N,S], lang [N,S], x_lens [N], prompt_cb0
    [N,p_audio-1], prompt_codes [N,t_audio,8], prompt_lens [N],
    gen_caps [N], seeds [N]) → (codes [N,t_audio,8], gen_lens [N]) with
    N = devices · per_chip; shard_map splits the leading axis."""
    from .pipeline import _assemble_nar_input_batch

    # packed once on the host side of the shard_map; replicated like params
    packed, _ = prepare_packed_weights(
        params, compute_dtype=ecfg.compute_dtype,
        quantize=getattr(ecfg, "quantize", "none"), need_draft=False,
    )

    def chunk(
        text_ids, lang_ids, x_lens, prompt_cb0, prompt_codes,
        prompt_lens, gen_caps, seeds
    ):
        # per-device slices: [per_chip, ...]
        key = jax.random.PRNGKey(0)
        for i in range(per_chip):  # fold EVERY request's seed in
            key = jax.random.fold_in(key, seeds[i])
        plain = bool(
            (ecfg.top_k <= 0 or ecfg.top_k == 1) and ecfg.top_p >= 1.0
        )
        y_gen, gen_len, _ = ar_generate_batch(
            params, cfg, text_ids, lang_ids, x_lens,
            prompt_cb0, prompt_lens, gen_caps,
            key,
            jnp.asarray(ecfg.top_k, jnp.int32),
            jnp.asarray(ecfg.temperature, jnp.float32),
            jnp.asarray(ecfg.top_p, jnp.float32),
            s_text=s_text, p_audio=p_audio, t_gen=t_gen,
            compute_dtype=ecfg.compute_dtype,
            greedy=bool(ecfg.top_k == 1),
            quantize=getattr(ecfg, "quantize", "none"),
            decode_steps=max(2, getattr(ecfg, "decode_steps", 8)),
            plain_sampling=plain,
            packed=packed,
        )
        codes_in = _assemble_nar_input_batch(
            y_gen, prompt_codes, prompt_lens, t_audio=t_audio
        )
        gen_len = gen_len.astype(jnp.int32)
        t_len = prompt_lens + gen_len
        codes = nar_generate(
            params, cfg, text_ids, lang_ids, x_lens,
            codes_in, t_len, prompt_lens,
            s_text=s_text, t_audio=t_audio,
            compute_dtype=ecfg.compute_dtype,
            use_flash=nar_use_flash(cfg),
        )
        return codes, gen_len

    sharded = jax.shard_map(
        chunk,
        mesh=mesh,
        in_specs=(
            P("dp", None), P("dp", None), P("dp"),
            P("dp", None), P("dp", None, None), P("dp"), P("dp"), P("dp"),
        ),
        out_specs=(P("dp", None, None), P("dp")),
        check_vma=False,  # see make_batched_synthesis
    )
    return jax.jit(sharded)


def make_batched_synthesis(
    params: Params,
    cfg: ModelConfig,
    ecfg: EngineConfig,
    mesh: Mesh,
    *,
    s_text: int,
    p_audio: int,
    t_audio: int,
    decode_mode: str = "xla",
):
    """Build a jitted, mesh-sharded synthesis function for fixed buckets.

    Returns fn(text_ids [N,S], lang_ids [N,S], x_lens [N], prompt_cb0
    [N,p_audio-1], prompt_codes [N,t_audio,8], prompt_lens [N], seeds [N])
    → (codes [N, t_audio, 8], gen_lens [N]); N must equal mesh dp size.
    """
    eos = cfg.eos_id
    plain = bool(
        (ecfg.top_k <= 0 or ecfg.top_k == 1) and ecfg.top_p >= 1.0
    )
    quantize = getattr(ecfg, "quantize", "none")
    decode_steps = getattr(ecfg, "decode_steps", 1)
    speculative = getattr(ecfg, "speculative", "auto") in ("auto", "on", True)
    packed = packed_draft = None
    if decode_mode == "megakernel":
        # mirror ar_generate's spec gating: greedy spec does not require
        # plain sampling (greedy + top_p<1 still drafts)
        need_draft = bool(
            speculative and (plain or ecfg.top_k == 1) and decode_steps > 1
            and quantize == "none"
        )
        packed, packed_draft = prepare_packed_weights(
            params, compute_dtype=ecfg.compute_dtype,
            quantize=quantize, need_draft=need_draft,
        )

    def one_request(
        text_ids, lang_ids, x_len, prompt_cb0, prompt_codes, prompt_len, seed
    ):
        # shapes here are the per-device slices: [1, S], [1], ...
        res = ar_generate(
            params, cfg,
            text_ids, lang_ids, x_len[0],
            prompt_cb0, prompt_len[0],
            jax.random.fold_in(jax.random.PRNGKey(0), seed[0]),
            jnp.asarray(ecfg.top_k, jnp.int32),
            jnp.asarray(ecfg.top_p, jnp.float32),
            jnp.asarray(ecfg.temperature, jnp.float32),
            s_text=s_text, p_audio=p_audio, t_audio=t_audio,
            beams=1, compute_dtype=ecfg.compute_dtype,
            length_penalty=ecfg.length_penalty,
            decode_mode=decode_mode,
            plain_sampling=plain,
            greedy=bool(ecfg.top_k == 1),
            quantize=quantize,
            decode_steps=decode_steps,
            speculative=speculative,
            packed=packed, packed_draft=packed_draft,
        )
        # the AR buffer may carry K slack rows past t_audio
        y = res.tokens[res.best_beam][:t_audio]
        cb0 = jnp.concatenate([y[1:], jnp.full((1,), eos, y.dtype)])
        codes_in = prompt_codes.at[..., 0].set(cb0[None])
        t_len = prompt_len[0] + res.gen_len.astype(jnp.int32)
        codes = nar_generate(
            params, cfg, text_ids, lang_ids, x_len[0],
            codes_in, t_len, prompt_len[0],
            s_text=s_text, t_audio=t_audio,
            compute_dtype=ecfg.compute_dtype,
            use_flash=nar_use_flash(cfg),
        )
        return codes, res.gen_len.astype(jnp.int32)[None]

    # check_vma=False: no collectives run inside one_request, and the AR
    # while_loop carry mixes dp-varying tensors with replicated-init zeros
    # (sum_logprobs/done), which the varying-manual-axes checker would
    # reject without pcast noise at every init site.
    sharded = jax.shard_map(
        one_request,
        mesh=mesh,
        in_specs=(
            P("dp", None), P("dp", None), P("dp"),
            P("dp", None), P("dp", None, None), P("dp"), P("dp"),
        ),
        out_specs=(P("dp", None, None), P("dp")),
        check_vma=False,
    )
    return jax.jit(sharded)


def batch_synthesize(
    params: Params,
    cfg: ModelConfig,
    ecfg: EngineConfig,
    mesh: Mesh,
    requests: Sequence[Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]],
    *,
    seeds: Optional[Sequence[int]] = None,
    decode_mode: str = "xla",
    per_chip: int = 1,
) -> List[np.ndarray]:
    """Synthesize N (text_ids, lang_ids, prompt_codes|None) requests across
    the mesh → list of [T_i, 8] code arrays.

    per_chip > 1 composes the mesh sharding with in-chip multi-request
    batching: each device serves its own chunk of per_chip requests through
    ar_generate_batch (devices × per_chip concurrent streams). Requires the
    megakernel decode path (real TPU, or interpret-mode in tests)."""
    n_dev = mesh.devices.size
    N = len(requests)
    n_rows = n_dev * per_chip
    assert N <= n_rows, (
        f"{N} requests > {n_dev} devices x {per_chip} per chip "
        "(chunk the batch)"
    )

    max_s = max(len(t) for t, _, _ in requests)
    max_tp = max(
        (0 if p is None else len(p)) for _, _, p in requests
    )
    s_text = _bucket(max_s, ecfg.text_buckets)
    if per_chip > 1:
        p_audio = -(-(max_tp + 1) // ABLK) * ABLK
    else:
        p_audio = _bucket(max_tp + 1, ecfg.audio_buckets)
    t_gen = _bucket(
        min(16 * max_s + 1, ecfg.audio_buckets[-1]), ecfg.audio_buckets,
        granularity=512,
    )
    t_audio = _bucket(
        min(max_tp + 1 + 16 * max_s + 1, ecfg.audio_buckets[-1]),
        ecfg.audio_buckets,
        granularity=512,
    )
    if per_chip == 1:
        p_audio = min(p_audio, t_audio)

    text = np.zeros((n_rows, s_text), np.int32)
    lang = np.zeros((n_rows, s_text), np.int32)
    x_lens = np.ones((n_rows,), np.int32)
    # EOS-pad the codebook-0 prompt slots (see AREngine.generate: unwritten
    # pad slots must not count as generated frames)
    pcb0 = np.full((n_rows, p_audio - 1), cfg.eos_id, np.int32)
    pcodes = np.zeros((n_rows, t_audio, cfg.num_quantizers), np.int32)
    plens = np.zeros((n_rows,), np.int32)
    seed_arr = np.arange(n_rows, dtype=np.int32)
    if seeds is not None:
        seed_arr[: len(seeds)] = seeds

    for i, (t, l, p) in enumerate(requests):
        text[i, : len(t)] = t
        lang[i, : len(l)] = l
        x_lens[i] = len(t)
        if p is not None:
            pcb0[i, : len(p)] = p[:, 0]
            pcodes[i, : len(p)] = p
            plens[i] = len(p)

    sharding = NamedSharding(mesh, P("dp"))
    put = lambda a: jax.device_put(a, sharding)  # noqa: E731
    if per_chip > 1:
        caps = single_request_gen_caps(plens, x_lens, ecfg.audio_buckets)
        fn = make_chunked_synthesis(
            params, cfg, ecfg, mesh,
            s_text=s_text, p_audio=p_audio, t_gen=t_gen, t_audio=t_audio,
            per_chip=per_chip,
        )
        codes, gen_lens = fn(
            put(text), put(lang), put(x_lens), put(pcb0), put(pcodes),
            put(plens), put(caps), put(seed_arr),
        )
    else:
        fn = make_batched_synthesis(
            params, cfg, ecfg, mesh,
            s_text=s_text, p_audio=p_audio, t_audio=t_audio,
            decode_mode=decode_mode,
        )
        codes, gen_lens = fn(
            put(text), put(lang), put(x_lens), put(pcb0), put(pcodes),
            put(plens), put(seed_arr),
        )
    codes = np.asarray(codes)
    gen_lens = np.asarray(gen_lens)
    out = []
    for i in range(N):
        tp = int(plens[i])
        out.append(codes[i, tp : tp + int(gen_lens[i])])
    return out
