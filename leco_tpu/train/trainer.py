"""The training engine: one jitted ESD train step + the host-side loop.

Re-architecture of train_lora.py / train_lora_xl.py (p1atdev/LECO). The
reference runs, per iteration (train_lora.py:141-290):

    [with LoRA ON ]  t_to UNet fwds  @ 2B CFG batch, guidance 3   (no grad)
    [with LoRA OFF]  3 UNet fwds     @ 2B CFG batch, guidance 1   (no grad)
    [with LoRA ON ]  1 UNet fwd      @ 2B CFG batch, guidance 1   (grad)
    loss -> backward -> optimizer/lr step -> cuda cache flush

Here the whole iteration is ONE jitted function:

  * the inner partial-denoise is a `lax.fori_loop` with a traced bound
    (`timesteps_to` stays a runtime scalar -> a single compilation serves
    all 1..49);
  * the three reference predictions run at guidance 1, where CFG is an
    identity (uncond + 1*(text-uncond) == text, SURVEY.md quirk 6), so they
    collapse into ONE batched 3B UNet call on the conditioned embeddings —
    no uncond half, no separate calls: ~2.4x fewer UNet FLOPs/iter than the
    reference at identical math;
  * "with network:" scoping becomes which param tree each call sees: the
    inner denoise and the differentiated target call get base|lora merged,
    the reference predictions get the base tree only (LoRA layers detect the
    absent lora leaves and skip the branch);
  * the loss is computed on-device in fp32 (the reference round-trips all
    four predictions through CPU fp32, train_lora.py:213-256);
  * LoRA master params and optimizer state are fp32; the UNet runs in the
    configured compute dtype (bf16 by default);
  * data parallelism: batch sharded over a 1-D mesh when divisible,
    params replicated, XLA inserts the grad all-reduce (SURVEY.md 2.4).

Static per compiled step: (batch, height, width) — dynamic-resolution
buckets each compile once and are cached by jit.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import json
import threading
import time
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from leco_tpu.config import RootConfig, parse_precision
from leco_tpu.lora import (
    LoRASpec,
    count_lora_modules,
    fold_lora_params,
    merge_params,
    save_lora_weights,
    split_lora_params,
)
from leco_tpu.models.unet import UNet2DConditionModel
from leco_tpu.ops import schedulers as sched
from leco_tpu.parallel import mesh as mesh_lib
from leco_tpu.prompts import PromptEmbedsPair, PromptSettings, esd_loss
from leco_tpu.train import diffusion as diff
from leco_tpu.train.optim import get_lr_schedule, get_optimizer


@dataclasses.dataclass
class ModelBundle:
    """Everything the training loop needs, already on device."""

    unet: UNet2DConditionModel  # constructed WITH the LoRASpec
    base_params: dict  # frozen base tree (no lora leaves)
    lora_params: dict  # fp32 lora tree (the trainable part)
    scheduler: sched.NoiseScheduler
    spec: LoRASpec
    encode_fn: Optional[Callable] = None  # str -> (1,77,d) [or PromptEmbedsXL]
    is_xl: bool = False

    def free_text_encoder(self):
        """Reference deletes tokenizer+text encoder after caching
        (train_lora.py:134-137); here dropping the closure releases the
        device buffers."""
        self.encode_fn = None


def _make_step_body(
    bundle: ModelBundle,
    optimizer: optax.GradientTransformation,
    max_denoising_steps: int,
    mesh: Optional[Mesh] = None,
    inner_guidance_scale: float = 3.0,  # hardcoded in the ref, train_lora.py:192
):
    """Build the UN-jitted single-iteration body shared by make_train_step
    (jit per step) and make_train_multistep (lax.scan over K steps)."""
    unet = bundle.unet
    scheduler = bundle.scheduler
    state_n = scheduler.set_timesteps(max_denoising_steps)
    state_full = scheduler.set_timesteps(scheduler.num_train_timesteps)
    num_train_timesteps = scheduler.num_train_timesteps

    def apply_unet(params, sample, t, ctx, added):
        return unet.apply({"params": params}, sample, t, ctx, added)

    def step(
        base,
        lora,
        opt_state,
        key,
        pack,
        guidance_scale,
        erase_sign,
        timesteps_to,
        *,
        height: int,
        width: int,
        shard_batch: bool,
        shard_internal: bool = False,
    ):
        batch = pack["target_embeds"].shape[0]
        k_latents, k_sched = jax.random.split(key)

        # shard_internal: batch-1 multi-chip mode — the INTERNAL batches
        # (2B CFG, 3B refs) shard over dp and the latent H over sp, so a
        # v5e-8 accelerates the reference's default batch-1 recipe without
        # changing training semantics (VERDICT round 1, item 4).
        def constrain(x):
            return mesh_lib.constrain_internal(x, mesh, shard_internal)

        latents = diff.get_initial_latents(
            k_latents, state_n, batch, height, width
        )
        latents = mesh_lib.constrain_batch(latents, mesh, shard_batch)
        latents = constrain(latents)

        # LoRA ON for the inner loop. Default: fold the rank-r branches
        # into the kernels once (the loop reuses them ~t_to times under
        # stop_gradient — see lora.fold_lora_params). LECO_FOLD_INNER=0
        # keeps the literal branch form.
        if os.environ.get("LECO_FOLD_INNER", "1") == "1":
            params_on = fold_lora_params(base, lora, bundle.spec)
        else:
            params_on = merge_params(base, lora)

        # ---- inner partial denoise, LoRA ON, guidance 3 (train_lora.py:179-193)
        unet_on = lambda s, t, c, a: apply_unet(params_on, s, t, c, a)
        denoised = diff.diffusion(
            unet_on,
            state_n,
            k_sched,
            latents,
            pack["inner_embeds"],
            timesteps_to,
            guidance_scale=inner_guidance_scale,
            added_cond_kwargs=pack.get("inner_added"),
            constrain_fn=constrain if shard_internal else None,
        )
        denoised = jax.lax.stop_gradient(denoised)

        # ---- training timestep on the 1000-step schedule:
        # timesteps[int(t_to * 1000 / max_denoising_steps)] (train_lora.py:195-199)
        idx = (timesteps_to * num_train_timesteps) // max_denoising_steps
        t = state_full.timesteps[idx]
        in_scale = state_full.input_scales[idx]

        # ---- 3 reference predictions, LoRA OFF, one batched call
        # (guidance 1 == conditioned branch only; train_lora.py:202-237)
        ref_in = constrain(jnp.tile(denoised, (3, 1, 1, 1)) * in_scale)
        ref_preds = apply_unet(
            base, ref_in, t, pack["ref_embeds"], pack.get("ref_added")
        )
        ref_preds = ref_preds.astype(jnp.float32)
        positive, neutral, uncond = jnp.split(ref_preds, 3, axis=0)

        # ---- differentiated target prediction, LoRA ON (train_lora.py:244-256)
        def loss_fn(lora_p):
            params = merge_params(base, lora_p)
            # no concat-GEMM fusion under grad: its cotangent GEMM runs at
            # the full concatenated width and (multi-chip) the grad
            # all-reduce rides it — see lora.ride_along_suspended
            from leco_tpu import lora as lora_lib

            with lora_lib.ride_along_suspended():
                pred = apply_unet(
                    params,
                    constrain(denoised * in_scale),
                    t,
                    pack["target_embeds"],
                    pack.get("target_added"),
                )
            return esd_loss(
                pred, positive, uncond, neutral, guidance_scale, erase_sign
            )

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return step


def make_train_step(
    bundle: ModelBundle,
    optimizer: optax.GradientTransformation,
    max_denoising_steps: int,
    mesh: Optional[Mesh] = None,
    inner_guidance_scale: float = 3.0,
):
    """Build the jitted train step.

    Returns step(base, lora, opt_state, key, pack, guidance_scale,
    erase_sign, timesteps_to, *, height, width, shard_batch) ->
    (lora, opt_state, loss)

    `pack` is a dict of embedding batches built by `build_pack`:
      inner_embeds (2B, 77, d), ref_embeds (3B, 77, d), target_embeds
      (B, 77, d); for XL additionally inner_added / ref_added / target_added
      dicts of {"text_embeds", "time_ids"}.
    """
    body = _make_step_body(
        bundle, optimizer, max_denoising_steps, mesh, inner_guidance_scale
    )
    return jax.jit(
        body,
        static_argnames=("height", "width", "shard_batch", "shard_internal"),
        donate_argnames=("lora", "opt_state"),
    )


def make_train_multistep(
    bundle: ModelBundle,
    optimizer: optax.GradientTransformation,
    max_denoising_steps: int,
    mesh: Optional[Mesh] = None,
    inner_guidance_scale: float = 3.0,
):
    """Build the jitted K-step train chunk (train.step_chunk > 1).

    One device program runs K consecutive iterations as a `lax.scan` over
    the single-step body: the host dispatches once per chunk instead of
    once per step, so per-iteration host work (python, RPC issue, tunnel
    round-trips) amortizes K-fold. K is implicit in the shape of
    `timesteps_to_seq` — one compilation per distinct K.

    Semantics are identical to K sequential make_train_step calls:
      * the PRNG key is carried through the scan and split once per step in
        the same order the host loop splits it, so the noise/timestep
        streams match the unchunked path bit-for-bit;
      * the EMA update (when `with_ema`) applies after each step inside the
        scan with the SAME host-precomputed f32 complement coefficient the
        unchunked path constant-folds, so the lerp is bit-identical;
      * pack / guidance / sign are chunk-constant (the host only forms
        chunks over runs of iterations with the same prompt pair and
        resolution — see train()).

    Returns multistep(base, lora, opt_state, ema, key, pack,
    guidance_scale, erase_sign, timesteps_to_seq, ema_decay,
    ema_complement, *, height, width, shard_batch, shard_internal,
    with_ema) -> (lora, opt_state, ema, key, losses[K]).
    Pass ema=() (an empty pytree) when with_ema is False.
    """
    body = _make_step_body(
        bundle, optimizer, max_denoising_steps, mesh, inner_guidance_scale
    )

    @functools.partial(
        jax.jit,
        static_argnames=(
            "height",
            "width",
            "shard_batch",
            "shard_internal",
            "with_ema",
        ),
        donate_argnames=("lora", "opt_state", "ema", "key"),
    )
    def multistep(
        base,
        lora,
        opt_state,
        ema,
        key,
        pack,
        guidance_scale,
        erase_sign,
        timesteps_to_seq,
        ema_decay,
        ema_complement,
        *,
        height: int,
        width: int,
        shard_batch: bool,
        shard_internal: bool = False,
        with_ema: bool = False,
    ):
        def scan_body(carry, timesteps_to):
            lora, opt_state, ema, key = carry
            key, sub = jax.random.split(key)
            lora, opt_state, loss = body(
                base,
                lora,
                opt_state,
                sub,
                pack,
                guidance_scale,
                erase_sign,
                timesteps_to,
                height=height,
                width=width,
                shard_batch=shard_batch,
                shard_internal=shard_internal,
            )
            if with_ema:
                # ema_complement is the HOST-precomputed f32(1.0 - decay)
                # (correctly rounded from f64), not a traced f32 subtraction
                # — the same constant the unchunked host path folds, so
                # chunked and per-step EMA are bit-identical
                ema = jax.tree.map(
                    lambda a, b: a * ema_decay
                    + b.astype(a.dtype) * ema_complement,
                    ema,
                    lora,
                )
            return (lora, opt_state, ema, key), loss

        (lora, opt_state, ema, key), losses = jax.lax.scan(
            scan_body, (lora, opt_state, ema, key), timesteps_to_seq
        )
        return lora, opt_state, ema, key, losses

    return multistep


def build_pack(pair: PromptEmbedsPair, is_xl: bool, height: int, width: int,
               rng: Optional[np.random.Generator] = None) -> dict:
    """Assemble the per-iteration embedding batches for one prompt pair.

    SD: cache values are (1, 77, d) arrays. XL: PromptEmbedsXL with
    .text_embeds (1, 77, 2048) and .pooled_embeds (1, 1280).
    """
    b = pair.batch_size

    def seq(e):
        return e.text_embeds if is_xl else e

    target, positive, uncond, neutral = (
        pair.target,
        pair.positive,
        pair.unconditional,
        pair.neutral,
    )
    pack = {
        # [uncond]*b + [target]*b — 2B CFG batch for the inner denoise
        "inner_embeds": diff.concat_embeddings(seq(uncond), seq(target), b),
        # [positive]*b + [neutral]*b + [uncond]*b — batched references
        "ref_embeds": jnp.concatenate(
            [
                jnp.repeat(seq(positive), b, axis=0),
                jnp.repeat(seq(neutral), b, axis=0),
                jnp.repeat(seq(uncond), b, axis=0),
            ],
            axis=0,
        ),
        "target_embeds": jnp.repeat(seq(target), b, axis=0),
    }
    if is_xl:
        time_ids = jnp.asarray(
            diff.get_add_time_ids(
                height, width, dynamic_crops=pair.dynamic_crops, rng=rng
            )
        )

        def added(pooled_list, n):
            pooled = jnp.concatenate(
                [jnp.repeat(p.pooled_embeds, b, axis=0) for p in pooled_list],
                axis=0,
            )
            return {
                "text_embeds": pooled,
                "time_ids": jnp.tile(time_ids, (n * b, 1)),
            }

        pack["inner_added"] = added([uncond, target], 2)
        pack["ref_added"] = added([positive, neutral, uncond], 3)
        pack["target_added"] = added([target], 1)
    return pack


def encode_prompt_pairs(
    prompts: list[PromptSettings], encode_fn: Callable, is_xl: bool = False
) -> list[PromptEmbedsPair]:
    """Encode each unique prompt once (train_lora.py:106-132)."""
    from leco_tpu.prompts import PromptEmbedsCache

    cache = PromptEmbedsCache()
    pairs = []
    for settings in prompts:
        for prompt in [
            settings.target,
            settings.positive,
            settings.neutral,
            settings.unconditional,
        ]:
            if cache[prompt] is None:
                cache[prompt] = encode_fn(prompt)
        pairs.append(
            PromptEmbedsPair(
                cache[settings.target],
                cache[settings.positive],
                cache[settings.unconditional],
                cache[settings.neutral],
                settings,
            )
        )
    return pairs


def _multihost_shared_seed(seed: Optional[int]) -> Optional[int]:
    """Every host must sample the SAME (pair, timesteps_to, bucket) sequence
    per iteration — the jitted step is SPMD over the global mesh, so a host
    whose loop diverges (different resolution -> different compiled program)
    would deadlock the collectives. With a configured seed all hosts already
    agree; with seed=None each host would draw independent OS entropy, so
    host 0's draw is broadcast to everyone (single-process: pass-through,
    preserving the reference's unseeded behavior)."""
    if jax.process_count() == 1:
        return seed
    from jax.experimental import multihost_utils

    if seed is None:
        seed = int(np.random.SeedSequence().entropy % (2**63))
    local = np.asarray([seed], dtype=np.int64)
    return int(multihost_utils.broadcast_one_to_all(local)[0])


def train(
    config: RootConfig,
    prompts: list[PromptSettings],
    bundle: ModelBundle,
    mesh: Optional[Mesh] = None,
    on_step: Optional[Callable] = None,
) -> dict:
    """The training loop (reference train(), train_lora.py:34-321).

    Returns {"lora": final lora tree, "losses": [...], "saved": [paths]}.
    `on_step(i, loss)` is an optional observer hook (used by tests/bench).
    """
    # LECO_TRAIN_STAGES=1: timestamped setup-stage prints. Exists because a
    # warm full run on a freshly restarted tunnel runtime showed a silent
    # ~173 s host block between bundle build and the step trace that no
    # per-component number could attribute (round-5 TTFI forensics).
    _stage_t0 = time.perf_counter()
    if os.environ.get("LECO_TRAIN_STAGES") == "1":
        def _stage(msg: str) -> None:
            print(
                f"[train +{time.perf_counter() - _stage_t0:7.1f}s] {msg}",
                flush=True,
            )
    else:
        def _stage(msg: str) -> None:
            return None

    metadata = {
        "prompts": ",".join(p.model_dump_json() for p in prompts),
        "config": config.model_dump_json(),
    }
    save_path = Path(config.save.path)

    if config.logging.verbose:
        print(metadata)

    wandb_run = None
    if config.logging.use_wandb:
        try:
            import wandb

            wandb_run = wandb.init(
                project=f"LECO_{config.save.name}", config=metadata
            )
        except ImportError:
            print("wandb not installed; continuing without it")

    save_dtype = np.dtype(parse_precision(config.save.precision))

    seed = _multihost_shared_seed(config.train.seed)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed if seed is not None else rng.integers(2**31))

    # ---- prompt encoding, once (train_lora.py:106-137)
    assert bundle.encode_fn is not None, "bundle.encode_fn required"
    _stage("setup: begin prompt encoding")
    pairs = encode_prompt_pairs(prompts, bundle.encode_fn, bundle.is_xl)
    bundle.free_text_encoder()
    _stage("setup: prompts encoded")

    print(f"create LoRA for U-Net: {count_lora_modules(bundle.lora_params)} modules.")
    for settings in prompts:
        print(settings)

    # ---- optimizer (train_lora.py:80-95)
    lr_schedule = get_lr_schedule(
        config.train.lr_scheduler,
        config.train.lr,
        config.train.iterations,
        lr_min=config.train.lr / 100,
    )
    optimizer = get_optimizer(
        config.train.optimizer, lr_schedule, config.train.optimizer_args
    )
    # lr values for logging, precomputed in ONE device round-trip:
    # float(lr_schedule(j)) per iteration is a device computation + fetch
    # (~50 ms each through a tunneled TPU — measured as the largest single
    # host-loop overhead in the round-4 full-recipe run). The dispatch is
    # async here; the HOST-SIDE fetch is deferred to the first lr_at call
    # (the first loss drain) — round-5 TTFI forensics caught this
    # np.asarray blocking ~173 s on a fresh runtime, serializing the
    # device's bundle-init drain with the step trace/lower instead of
    # overlapping them.
    try:
        lr_values_dev = jax.vmap(lr_schedule)(
            jnp.arange(config.train.iterations)
        )
    except Exception:  # exotic schedule not vmappable -> per-step fallback
        lr_values_dev = None
    _stage("setup: lr schedule dispatched (fetch deferred to first drain)")
    lr_values: Optional[np.ndarray] = None

    def lr_at(j: int) -> float:
        nonlocal lr_values
        if lr_values_dev is not None:
            if lr_values is None:
                lr_values = np.asarray(lr_values_dev)
            return float(lr_values[j])
        return float(lr_schedule(j))

    lora = bundle.lora_params
    # one compiled program instead of ~2 eager dispatches per LoRA leaf
    # (adam mu/nu zeros: ~20 sub-second XLA compiles + hundreds of tiny
    # RPCs through a tunneled runtime); eager fallback for any custom
    # optimizer whose init is not traceable
    try:
        opt_state = jax.jit(optimizer.init)(lora)
    except Exception:
        opt_state = optimizer.init(lora)
    base = bundle.base_params
    _stage("setup: optimizer state initialized (dispatched)")

    # ---- optional EMA of the LoRA weights (leco-tpu extension; the
    # reference has no EMA). Initialized AT the current weights so there is
    # no zero-init bias to correct; updated on-device right after each step
    # (LoRA trees are MBs — the lerp is noise next to the UNet passes).
    ema_decay = float(config.train.ema_decay)
    ema = None
    ema_update = None
    if ema_decay > 0.0:
        if not 0.0 < ema_decay < 1.0:
            raise ValueError(f"train.ema_decay must be in (0, 1), got {ema_decay}")
        # real copies, not aliases: step_fn DONATES the lora buffers, so an
        # aliased ema tree would be invalidated by the first step
        ema = jax.tree.map(lambda x: jnp.array(x, copy=True), lora)

        @jax.jit
        def ema_update(e, p):
            return jax.tree.map(
                lambda a, b: a * ema_decay + b.astype(a.dtype) * (1.0 - ema_decay),
                e,
                p,
            )

    # ---- optional full-state resume (leco-tpu extension; the reference
    # cannot resume, SURVEY.md section 5.4)
    state_dir = save_path / "state"
    start_iteration = 0
    if config.train.resume:
        from leco_tpu.train import checkpoint as ckpt

        restored = ckpt.restore_train_state(
            state_dir, like={"lora": lora, "opt_state": opt_state}
        )
        if restored is not None:
            lora = jax.tree.map(jnp.asarray, restored["lora"])
            opt_state = jax.tree.map(jnp.asarray, restored["opt_state"])
            start_iteration = restored["iteration"] + 1
            key = restored["key"]
            rng = restored["rng"]
            if ema is not None:
                # snapshots from before EMA was enabled lack the tree:
                # restart the average from the restored weights. Copy, not
                # alias — the restored lora tree is donated by the first step.
                ema = jax.tree.map(
                    lambda x: jnp.array(x, copy=True),
                    restored.get("ema", restored["lora"]),
                )
            print(f"resumed from {state_dir} at iteration {start_iteration}")

    step_fn = make_train_step(
        bundle, optimizer, config.train.max_denoising_steps, mesh=mesh
    )
    _stage("setup: step_fn built (trace happens at first dispatch)")
    # device-side step chunking (train.step_chunk, default 1 = off): scan
    # K steps in one jitted call so the host dispatches once per chunk.
    # Only exactly-K chunks use the scan program (one extra compile);
    # boundary/remainder iterations run through step_fn, whose compiled
    # program is shared with unchunked runs.
    chunk = max(1, int(config.train.step_chunk))
    multistep_fn = None
    if chunk > 1:
        multistep_fn = make_train_multistep(
            bundle, optimizer, config.train.max_denoising_steps, mesh=mesh
        )

    pack_cache: dict = {}
    # device-scalar cache: jnp.float32(...)/jnp.int32(...) per iteration is
    # a fresh host->device transfer (one small RPC each on a tunneled TPU,
    # x3 per step). Every value is drawn from a tiny finite set — per-pair
    # guidance/sign constants and timesteps_to in [1, max_denoising_steps)
    # — so transfer each exactly once. The step never donates these.
    scalar_cache: dict = {}

    def dev_scalar(dtype, v):
        k = (dtype, v)
        a = scalar_cache.get(k)
        if a is None:
            a = scalar_cache[k] = dtype(v)
        return a

    losses: list[float] = []
    # pending loss groups awaiting their device->host fetch. Each group is
    # (metas, losses_dev): metas a list of (iteration, timesteps_to, h, w)
    # and losses_dev the step's scalar loss (single path) or the chunk's
    # (K,) loss vector (multistep path). Groups drain strictly in order, so
    # metrics.jsonl stays iteration-ordered however the two paths interleave.
    pending_groups: list = []
    saved: list[Path] = []
    save_path.mkdir(parents=True, exist_ok=True)
    metrics_file = open(save_path / "metrics.jsonl", "a")

    # ---- periodic-save writer (save.async_write, default on): the step
    # DONATES the lora buffers, so a background writer must not hold the
    # live tree — snapshot it on-device (a non-donating copy; LoRA trees
    # are MBs) and let the thread fetch + serialize while the loop keeps
    # dispatching. (Round-5 postscript: with the deferred-fetch drain the
    # loop is device-bound and the WHOLE save path measures < 5 ms — the
    # window-2/4 "save stalls" this feature was built against turned out
    # to be the seeded timesteps_to mix, docs/DESIGN.md. async_write still
    # matters under per-step fetching or a contended host, and the ~18 s
    # per-leaf-fetch save of early round 4 was real.) Writer failures
    # abort the loop at the
    # next iteration (fail-fast) and the in-memory weights are rescue-saved
    # under a distinct name; the written bytes are identical either way.
    # the snapshot is cast to save_dtype ON DEVICE: the writer's fetch then
    # moves half the bytes over the tunnel when saving bf16/fp16 (the f32
    # master's cast would otherwise happen host-side AFTER the transfer).
    # f32->bf16 rounds to nearest-even identically on device and host, so
    # the written file bytes are unchanged; export_lora_state's own cast
    # becomes a no-op.
    _snap_dtype = jnp.dtype(save_dtype)
    snap_tree = jax.jit(
        lambda t: jax.tree.map(lambda x: x.astype(_snap_dtype), t)
    )
    save_threads: list[threading.Thread] = []
    save_errors: list[BaseException] = []

    def submit_save(p: Path, tree) -> None:
        saved.append(p)
        if not config.save.async_write:
            save_lora_weights(p, tree, bundle.spec, save_dtype, metadata)
            return
        snapped = snap_tree(tree)
        # start the D2H transfers non-blocking from THIS thread, so the
        # writer's later device_get finds the buffers already landed (or
        # landing) instead of initiating a blocking fetch. Measured effect
        # on the device-bound full-recipe loop: none — the round-5 A/B
        # left every per-100 window bit-identical, proving the whole save
        # path (snapshot, thread, fetch) costs < 5 ms of stream time there
        # (docs/DESIGN.md, "the save dips were never saves"). Kept because
        # it is strictly earlier work with no cost, and it matters exactly
        # when the host is NOT comfortably ahead: per-step fetch
        # discipline (logging.interval 1) or a contended host.
        jax.tree.map(lambda x: x.copy_to_host_async(), snapped)

        def _write():
            try:
                save_lora_weights(
                    p, snapped, bundle.spec, save_dtype, metadata
                )
            except BaseException as e:  # surfaced at the pre-final join
                save_errors.append(e)

        th = threading.Thread(target=_write, name=f"leco-save-{p.name}")
        th.start()
        save_threads.append(th)

    try:
        from tqdm import tqdm

        pbar = tqdm(
            total=config.train.iterations, initial=start_iteration
        )
    except ImportError:  # pragma: no cover
        pbar = None

    def emit(j: int, loss_val: float, j_tsto: int, j_h: int, j_w: int):
        """Log one drained loss with its own iteration's sampled metadata."""
        if not np.isfinite(loss_val):
            # failure detection the reference lacks (SURVEY.md 5.3):
            # stop before writing a corrupted checkpoint over a good
            # one; flush the metrics file so the evidence reaches disk
            metrics_file.close()
            raise FloatingPointError(
                f"non-finite loss {loss_val} at iteration {j}; aborting "
                "(last good LoRA weights are in the previous periodic "
                "save)"
            )
        losses.append(loss_val)
        if pbar is not None:
            pbar.set_description(f"Loss*1k: {loss_val * 1000:.4f}")
        record = {
            "loss": loss_val,
            "iteration": j,
            "lr": lr_at(j),
            "timesteps_to": j_tsto,
            "resolution": [j_h, j_w],
        }
        metrics_file.write(json.dumps(record) + "\n")
        if wandb_run is not None:
            wandb_run.log({"loss": loss_val, "iteration": j, "lr": lr_at(j)})
        if on_step is not None:
            on_step(j, loss_val)

    _first_drain = [True]

    def drain_groups(groups: list) -> None:
        """Materialize a batch of pending loss groups in ONE device->host
        transfer (per-item float() costs a tunnel round-trip each)."""
        vals = jax.device_get([g[1] for g in groups])
        if _first_drain[0]:
            _first_drain[0] = False
            _stage("loop: first losses fetched (device pipeline live)")
        for (metas, _), arr in zip(groups, vals):
            arr = np.atleast_1d(np.asarray(arr))
            for (j, j_tsto, j_h, j_w), v in zip(metas, arr):
                emit(j, float(v), j_tsto, j_h, j_w)

    def maybe_drain() -> None:
        # async loss drain: with logging.interval > 1 the host keeps
        # dispatching while earlier losses are still in flight; each
        # pending group carries its iterations' sampled metadata so the
        # drained records are labeled correctly however late they land.
        # interval == 1 fetches after every dispatch (the reference's
        # per-step display; with chunking, per-chunk — the finest possible);
        # interval > 1 batch-fetches the oldest `interval` iterations once
        # 2*interval are pending, so `interval` iterations always stay in
        # flight (draining to empty would stall the dispatch pipeline)
        interval = max(1, config.logging.interval)
        if interval == 1:
            batch = pending_groups[:]
            pending_groups.clear()
            drain_groups(batch)
            return
        if sum(len(g[0]) for g in pending_groups) >= 2 * interval:
            n = cut = 0
            for g in pending_groups:
                if n >= interval:
                    break
                n += len(g[0])
                cut += 1
            batch = pending_groups[:cut]
            del pending_groups[:cut]
            drain_groups(batch)

    def sample_iteration():
        """Draw one iteration's (pair, timesteps_to, resolution, pack) in
        the reference's sampling order (train_lora.py:141-176). Chunk
        formation looks ahead through this, so the host RNG stream is
        identical at every step_chunk setting."""
        # pre-draw rng state: if this sample is still buffered (lookahead
        # overshoot) when a checkpoint fires, the snapshot must store the
        # state from BEFORE its draws so resume replays it identically
        rng_state = dict(rng.bit_generator.state)
        pair = pairs[int(rng.integers(0, len(pairs)))]
        timesteps_to = int(
            rng.integers(1, config.train.max_denoising_steps)
        )  # train_lora.py:154-156

        height, width = pair.resolution, pair.resolution
        if pair.dynamic_resolution:
            height, width = diff.get_random_resolution_in_bucket(
                rng, pair.resolution
            )

        if config.logging.verbose:
            print("guidance_scale:", pair.guidance_scale)
            print("resolution:", pair.resolution)
            print("dynamic_resolution:", pair.dynamic_resolution)
            if pair.dynamic_resolution:
                print("bucketed resolution:", (height, width))
            print("batch_size:", pair.batch_size)

        # XL dynamic_crops re-rolls time_ids every iteration (fresh pack,
        # never chunkable); cache otherwise
        if bundle.is_xl and pair.dynamic_crops:
            pack = build_pack(pair, bundle.is_xl, height, width, rng=rng)
            chunkable = False
        else:
            cache_key = (id(pair), height, width)
            pack = pack_cache.get(cache_key)
            if pack is None:
                pack = pack_cache[cache_key] = build_pack(
                    pair, bundle.is_xl, height, width
                )
            chunkable = True
        return (pair, timesteps_to, height, width, pack, chunkable, rng_state)

    iterations = config.train.iterations
    per_steps = config.save.per_steps
    meta_buf: list = []  # lookahead-sampled iterations awaiting execution
    i = start_iteration
    _stage("loop: entering (next: first step dispatch = trace+compile/load)")
    while i < iterations:
        # fail fast on a dead background writer: a failed periodic save
        # otherwise surfaces only at the end of the run, hours of training
        # later (round-4 advisor finding). The in-memory weights are still
        # good — the rescue save below the loop preserves them.
        if save_errors:
            break
        if not meta_buf:
            meta_buf.append(sample_iteration())
        first = meta_buf[0]

        # a save observes the tree after iteration j (j % per_steps == 0,
        # j != 0), so a chunk starting at i may extend at most through that
        # j inclusive; never past the final iteration
        if per_steps > 0:
            stop = (
                i
                if (i % per_steps == 0 and i != 0)
                else ((i // per_steps) + 1) * per_steps
            )
            limit = min(chunk, stop + 1 - i, iterations - i)
        else:
            limit = min(chunk, iterations - i)

        # grow the lookahead while the sampled iterations match the chunk
        # head (same pair => same pack/guidance/sign/batch; same static
        # shapes). A mismatched draw stays buffered for the next chunk.
        def _matches(m):
            return (
                m[5]
                and m[0] is first[0]
                and m[2] == first[2]
                and m[3] == first[3]
            )

        # n = length of the matching prefix already buffered; grow the
        # lookahead while the WHOLE buffer is one matching run (a buffered
        # mismatch blocks the chunk regardless — execution is in sample
        # order — so growing past it is pointless; round-4 advisor finding)
        n = 1
        while n < len(meta_buf) and _matches(meta_buf[n]):
            n += 1
        if multistep_fn is not None and first[5]:
            while n == len(meta_buf) < limit:
                meta_buf.append(sample_iteration())
                if _matches(meta_buf[-1]):
                    n += 1
        n = min(n, limit)

        pair = first[0]
        height, width = first[2], first[3]
        pack = first[4]
        shard = mesh_lib.shardable_batch(pair.batch_size, mesh)
        # internal sharding engages in two cases (constrain_internal puts
        # divisible leading batch dims on dp and the latent H on sp):
        #  * batch-1 multi-chip: the logical batch cannot shard, so the
        #    internal 2B/3B packs over dp + latent H over sp is the only
        #    way a slice accelerates the reference's default recipe;
        #  * dp x sp mesh with a shardable batch (the shipped batch-2
        #    recipe, examples/prompts.yaml): dp carries the logical batch
        #    but sp would idle without the H constraint — and the 3bB
        #    reference pack dp-shards too once 3b divides dp
        #    (docs/SCALING.md, "Batch 2 — the recipe as shipped").
        shard_internal = mesh is not None and (
            (not shard and mesh_lib.axis_size(mesh, mesh_lib.DP_AXIS) > 1)
            or mesh_lib.axis_size(mesh, mesh_lib.SP_AXIS) > 1
        )
        gs = dev_scalar(jnp.float32, pair.guidance_scale)
        sign = dev_scalar(jnp.float32, pair.erase_sign)

        if multistep_fn is not None and n == chunk:
            # exactly-K chunk -> one device program runs all K steps; the
            # PRNG key advances inside the scan in host-split order
            metas = meta_buf[:chunk]
            del meta_buf[:chunk]
            tsto_seq = jnp.asarray(
                [m[1] for m in metas], dtype=jnp.int32
            )
            lora, opt_state, ema_out, key, loss_arr = multistep_fn(
                base,
                lora,
                opt_state,
                ema if ema is not None else (),
                key,
                pack,
                gs,
                sign,
                tsto_seq,
                dev_scalar(jnp.float32, ema_decay),
                dev_scalar(jnp.float32, 1.0 - ema_decay),
                height=height,
                width=width,
                shard_batch=shard,
                shard_internal=shard_internal,
                with_ema=ema is not None,
            )
            if ema is not None:
                ema = ema_out
            pending_groups.append(
                (
                    [
                        (i + k, m[1], m[2], m[3])
                        for k, m in enumerate(metas)
                    ],
                    loss_arr,
                )
            )
            executed = chunk
        else:
            m = meta_buf.pop(0)
            key, sub = jax.random.split(key)
            lora, opt_state, loss = step_fn(
                base,
                lora,
                opt_state,
                sub,
                pack,
                gs,
                sign,
                dev_scalar(jnp.int32, m[1]),
                height=height,
                width=width,
                shard_batch=shard,
                shard_internal=shard_internal,
            )
            if ema is not None:
                ema = ema_update(ema, lora)
            pending_groups.append(([(i, m[1], m[2], m[3])], loss))
            executed = 1

        if i == start_iteration:
            _stage("loop: first step dispatched (async; trace+compile/load "
                   "done, execution in flight)")
        i += executed
        if pbar is not None:
            pbar.update(executed)
        maybe_drain()

        # periodic save (train_lora.py:292-302); chunks never cross a save
        # boundary, so `last` lands exactly on the cadence. per_steps <= 0
        # disables periodic saves entirely (the reference crashes with
        # ZeroDivisionError at train_lora.py:292; this framework documents
        # 0 = "final save only" instead)
        last = i - 1
        if (
            per_steps > 0
            and last % per_steps == 0
            and last != 0
            and last != config.train.iterations - 1
        ):
            print("Saving...")
            save_path.mkdir(parents=True, exist_ok=True)
            p = save_path / f"{config.save.name}_{last}steps.safetensors"
            submit_save(p, lora)
            if ema is not None:
                pe = save_path / f"{config.save.name}_{last}steps_ema.safetensors"
                submit_save(pe, ema)
            if config.train.save_state:
                from leco_tpu.train import checkpoint as ckpt

                # un-consumed lookahead draws must replay after resume:
                # snapshot the rng state from before the oldest buffered
                # sample (the live rng has already advanced past it)
                ckpt_rng = rng
                if meta_buf:
                    ckpt_rng = np.random.default_rng()
                    ckpt_rng.bit_generator.state = meta_buf[0][6]
                ckpt.save_train_state(
                    state_dir,
                    lora=lora,
                    opt_state=opt_state,
                    iteration=last,
                    key=key,
                    rng=ckpt_rng,
                    ema=ema,
                )

    # drain any in-flight losses (tail records reach metrics.jsonl too);
    # a NaN here must still abort BEFORE the final save below overwrites
    # the last good weights (emit() raises)
    if pending_groups:
        drain_groups(pending_groups)
    pending_groups.clear()
    if pbar is not None:
        pbar.close()

    # every periodic writer must land (and any failure surface) before the
    # final save, so train() returns with all of `saved` durable on disk
    for th in save_threads:
        th.join()
    if save_errors:
        # the periodic writer died, but the in-memory weights are still
        # good: preserve them under a DISTINCT name (never overwriting a
        # possibly-good `_last`) before surfacing the writer's error, so a
        # transient disk fault costs neither the run's time nor the weights
        rescue = save_path / f"{config.save.name}_rescue.safetensors"
        try:
            save_lora_weights(rescue, lora, bundle.spec, save_dtype, metadata)
            saved.append(rescue)
            print(f"background save failed; weights rescued to {rescue}")
        except BaseException as rescue_err:
            print(f"background save failed AND rescue save failed: "
                  f"{rescue_err}")
        metrics_file.close()
        raise save_errors[0]

    print("Saving...")
    save_path.mkdir(parents=True, exist_ok=True)
    p = save_path / f"{config.save.name}_last.safetensors"
    save_lora_weights(p, lora, bundle.spec, save_dtype, metadata)
    saved.append(p)
    if ema is not None:
        pe = save_path / f"{config.save.name}_last_ema.safetensors"
        save_lora_weights(pe, ema, bundle.spec, save_dtype, metadata)
        saved.append(pe)

    metrics_file.close()
    if wandb_run is not None:
        wandb_run.finish()
    print("Done.")

    return {"lora": lora, "losses": losses, "saved": saved, "ema": ema}
