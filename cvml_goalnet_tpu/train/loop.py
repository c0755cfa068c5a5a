"""Jitted training loop: one device program per video, scan over sub-batches.

Reference counterpart: ``train_importance_model`` (``main.py:26-298``).  The
reference runs a host Python while-loop issuing one forward/backward/step per
10-frame sub-batch (``main.py:177-196``).  Here the ENTIRE per-video pass —
every sub-batch forward, backward, and Adam update — is one ``lax.scan``
inside one jit, so the host↔device boundary is crossed once per video instead
of once per sub-batch.  Sub-batch semantics (immediate step per sub-batch, not
gradient accumulation) are preserved exactly.

Loss: the reference's ``MSELoss((n,1) preds, (n,) labels)`` silently
broadcasts to (n,n) (``main.py:191`` — SURVEY.md §7.1).  The default here is
the intended elementwise MSE; ``TrainConfig.broadcast_loss_compat`` restores
bug-compatible semantics for A/B comparison.  The classifier (CAVM/CVM)
variants use cross-entropy on grade-1 targets (``main.py:96-97,189-190``,
commented upstream).
"""

from __future__ import annotations

import time
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from cvml_goalnet_tpu.config import PipelineConfig
from cvml_goalnet_tpu.models.avm import avm_apply
from cvml_goalnet_tpu.ops.fscore import fscore_against_users_host
from cvml_goalnet_tpu.pipeline import summarize
from cvml_goalnet_tpu.train.optim import adam_update
from cvml_goalnet_tpu.train.state import TrainState
from cvml_goalnet_tpu.utils.logging import log_epoch_header, log_metrics, log_val_delta


def _loss_fn(preds, labels, mask, *, broadcast_compat: bool, classifier: bool):
    if classifier:
        logits = preds  # (n, 5)
        targets = (labels - 1).astype(jnp.int32)
        ll = -jax.nn.log_softmax(logits)[jnp.arange(logits.shape[0]), targets]
        return jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    if broadcast_compat:
        # Reference bug semantics: (n,1) vs (n,) → (n,n) pairwise MSE.
        d = preds - labels[None, :]
        m = mask[:, None] * mask[None, :]
        return jnp.sum(d * d * m) / jnp.maximum(jnp.sum(m), 1.0)
    d = preds[:, 0] - labels
    return jnp.sum(d * d * mask) / jnp.maximum(jnp.sum(mask), 1.0)


@lru_cache(maxsize=16)
def make_train_video_fn(cfg: PipelineConfig, classifier: bool = False):
    """Build the jitted per-video training function.

    Signature: ``fn(params, model_state, opt_state, visual (N,h,w,C),
    audio (N,B,M) | None, labels (N,), valid (N,), rng)`` with N padded to a
    multiple of ``subbatch_size`` → ``(params, model_state, opt_state,
    preds (N,), mean_subbatch_loss)``.
    """
    from cvml_goalnet_tpu.utils import tree_cast as cast

    tc = cfg.train
    mc = cfg.model
    S = tc.subbatch_size
    dtype = jnp.bfloat16 if tc.compute_dtype == "bfloat16" else jnp.float32

    from cvml_goalnet_tpu.train.optim import clip_by_global_norm, schedule_from_config

    lr_fn = schedule_from_config(tc)
    K = tc.grad_accum_steps

    def fn(params, model_state, opt_state, visual, audio, labels, valid, rng, text=None):
        n = visual.shape[0]
        n_sub = n // S

        def reshape(x):
            return None if x is None else x.reshape((n_sub, S) + x.shape[1:])

        batches = (reshape(visual), reshape(audio), reshape(text),
                   reshape(labels), reshape(valid))
        rngs = jax.random.split(rng, n_sub)

        def step(carry, xs):
            params, model_state, opt_state, gacc = carry
            vis, aud, txt, lab, msk, step_rng, idx = xs

            def loss_of(p):
                # mixed precision: bf16 forward/backward, f32 master params +
                # loss; grads land back in f32 through the cast's vjp
                moe = mc.fusion_moe_experts > 0 and mc.fusion_moe_aux_weight > 0
                fwd = avm_apply(
                    cast(p, dtype), cast(model_state, dtype),
                    cast(vis, dtype), cast(aud, dtype), txt,
                    cfg=mc, train=True, rng=step_rng, classifier=classifier,
                    return_moe_probs=moe,
                    # padded rows must not skew batchnorm statistics — the
                    # reference trains its final SHORT sub-batch unpadded
                    valid=msk,
                )
                preds, new_ms = fwd[0], fwd[1]
                loss = _loss_fn(
                    preds.astype(jnp.float32), lab, msk,
                    broadcast_compat=tc.broadcast_loss_compat,
                    classifier=classifier,
                )
                if moe:
                    # Switch-style load-balance penalty: without it the
                    # top-k gate can collapse onto one expert (models/moe.py)
                    from cvml_goalnet_tpu.models.moe import moe_load_balance_loss

                    loss = loss + mc.fusion_moe_aux_weight * moe_load_balance_loss(
                        fwd[2].astype(jnp.float32))
                return loss, (preds.astype(jnp.float32), cast(new_ms, jnp.float32))

            (loss, (preds, new_ms)), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
            if K <= 1:
                new_params, new_opt = adam_update(
                    clip_by_global_norm(grads, tc.grad_clip_norm),
                    opt_state, params, lr_fn(opt_state.step),
                    tc.b1, tc.b2, tc.eps, tc.weight_decay
                )
            else:
                # true gradient accumulation: mean over K sub-batches, one
                # Adam step per K (vs the reference's immediate step per
                # sub-batch, main.py:177-196); idx % K == K-1 ⇒ exactly K
                # grads accumulated since the last apply
                gacc = jax.tree.map(lambda a, g: a + g, gacc, grads)

                def apply(_):
                    p2, o2 = adam_update(
                        clip_by_global_norm(
                            jax.tree.map(lambda a: a / K, gacc),
                            tc.grad_clip_norm),
                        opt_state, params,
                        lr_fn(opt_state.step), tc.b1, tc.b2, tc.eps,
                        tc.weight_decay,
                    )
                    return p2, o2, jax.tree.map(jnp.zeros_like, gacc)

                new_params, new_opt, gacc = jax.lax.cond(
                    (idx % K) == (K - 1), apply,
                    lambda _: (params, opt_state, gacc), None,
                )
            out = preds[:, 0] if not classifier else jnp.argmax(preds, axis=1) + 1.0
            return (new_params, new_ms, new_opt, gacc), (out, loss)

        gacc0 = (jax.tree.map(jnp.zeros_like, params) if K > 1 else jnp.zeros(()))
        xs = batches + (rngs, jnp.arange(n_sub))
        (params, model_state, opt_state, gacc), (preds, losses) = jax.lax.scan(
            step, (params, model_state, opt_state, gacc0), xs
        )
        if K > 1 and n_sub % K:
            # flush the short tail (mirrors the reference training its final
            # short sub-batch rather than dropping it)
            rem = n_sub % K
            params, opt_state = adam_update(
                clip_by_global_norm(
                    jax.tree.map(lambda a: a / rem, gacc), tc.grad_clip_norm),
                opt_state, params,
                lr_fn(opt_state.step), tc.b1, tc.b2, tc.eps, tc.weight_decay,
            )
        return params, model_state, opt_state, preds.reshape(-1), jnp.mean(losses)

    return jax.jit(fn)


@lru_cache(maxsize=16)
def _make_eval_fn(cfg: PipelineConfig, classifier: bool = False):
    tc, mc = cfg.train, cfg.model

    def fn(params, model_state, visual, audio, labels, valid, text=None):
        # eval_train_mode_compat: the reference evaluates without .eval()
        # (train-mode BN — main.py:93-118); new batchnorm state is discarded.
        # The valid mask keeps zero-padding out of those train-mode BN stats
        # (the reference sees the whole UNPADDED video as one BN batch).
        preds, _ = avm_apply(
            params, model_state, visual, audio, text,
            cfg=mc, train=tc.eval_train_mode_compat, classifier=classifier,
            valid=valid,
        )
        loss = _loss_fn(
            preds, labels, valid,
            broadcast_compat=tc.broadcast_loss_compat, classifier=classifier,
        )
        out = preds[:, 0] if not classifier else jnp.argmax(preds, axis=1) + 1.0
        return out, loss

    return jax.jit(fn)


def _pad_video(item, S: int):
    """Pad a video's tensors to a multiple of the sub-batch size."""
    n = len(item.visual)
    pad = (-n) % S
    valid = np.ones((n + pad,), np.float32)
    valid[n:] = 0.0

    def pad_arr(x):
        if x is None:
            return None
        return np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)]) if pad else x

    labels = item.labels if item.labels is not None else np.zeros((n,), np.float32)
    text = getattr(item, "text", None)
    return (pad_arr(item.visual), pad_arr(item.audio), pad_arr(labels.astype(np.float32)),
            valid, n, pad_arr(text))


def eval_video(state: TrainState, item, cfg: PipelineConfig, classifier: bool = False):
    """Eval-mode forward + loss for one whole video (reference ``main.py:93-118``)."""
    fn = _make_eval_fn(cfg, classifier)
    visual, audio, labels, valid, n, text = _pad_video(item, cfg.train.subbatch_size)
    audio_in = jnp.asarray(audio) if (cfg.model.audio_included and audio is not None) else None
    text_in = jnp.asarray(text) if (cfg.model.text_included and text is not None) else None
    preds, loss = fn(
        state.params, state.model_state, jnp.asarray(visual), audio_in,
        jnp.asarray(labels), jnp.asarray(valid), text_in,
    )
    return np.asarray(preds)[:n], float(loss)


def _video_fscores(item, preds, cfg: PipelineConfig):
    """summarize + F-score vs annotator masks (reference ``utils.py:587-604``)."""
    res = summarize(
        preds, item.clip_intervals, cfg.preprocess.skip_frames,
        item.full_n_frames, cfg.knapsack,
    )
    return fscore_against_users_host(res.frame_mask, item.gd_summary_masks)


def evaluate_dataset(state: TrainState, ds, cfg: PipelineConfig,
                     classifier: bool = False):
    """Eval-mode (loss, F-avg, F-max) means over a dataset, or None when
    empty (e.g. a one-video dataset under train_ratio=0.8 — callers skip
    rather than np.mean([])-ing into NaN history entries).  The shared eval
    path of the train loop's initial/per-epoch evals (reference
    ``main.py:82-146``) and the ``goalnet eval`` verb."""
    if len(ds) == 0:
        return None
    losses, favgs, fmaxs = [], [], []
    for item in ds:
        preds, loss = eval_video(state, item, cfg, classifier)
        fa, fm = _video_fscores(item, preds, cfg)
        losses.append(loss)
        favgs.append(fa)
        fmaxs.append(fm)
    return float(np.mean(losses)), float(np.mean(favgs)), float(np.mean(fmaxs))


def train_importance_model(
    cfg: PipelineConfig,
    train_ds,
    val_ds,
    state: TrainState,
    num_epochs: int | None = None,
    classifier: bool = False,
    checkpoint_dir: str | None = None,
    on_epoch_end=None,
    verbose: bool = True,
    metrics_logger=None,
    async_checkpoint: bool = False,
    preemption_guard=None,
    checkpoint_backend: str = "npz",
):
    """Full training driver (reference ``train_importance_model``, ``main.py:26-298``).

    Per epoch: scan-train each video, eval the val set, aggregate metrics,
    keep the best state by train-F-score-avg (reference ``main.py:255-263``)
    and checkpoint every epoch.  Returns (best_state, history dict).

    ``checkpoint_backend``: "npz" (portable default) or "orbax"
    (``train/orbax_io.py`` — sharded-aware save/restore for multi-chip jobs).
    """
    if checkpoint_backend == "orbax":
        from cvml_goalnet_tpu.train.orbax_io import save_checkpoint_orbax as save_checkpoint
    elif checkpoint_backend == "npz":
        from cvml_goalnet_tpu.train.checkpoint import save_checkpoint
    else:
        raise ValueError(f"unknown checkpoint_backend {checkpoint_backend!r}")

    if async_checkpoint:
        if checkpoint_backend != "npz":
            raise ValueError("async_checkpoint currently supports the npz backend only")
        from cvml_goalnet_tpu.train.checkpoint import AsyncCheckpointer

        _ck = AsyncCheckpointer()
        save_checkpoint = _ck.save  # noqa: F811 — same signature, off-thread

    from cvml_goalnet_tpu.train.optim import schedule_from_config

    train_fn = make_train_video_fn(cfg, classifier)
    _lr_of = schedule_from_config(cfg.train)
    num_epochs = cfg.train.num_epochs if num_epochs is None else num_epochs
    rng = jax.random.PRNGKey(cfg.train.seed)

    history: dict[str, list] = {
        "train_loss": [], "train_f_avg": [], "train_f_max": [],
        "val_loss": [], "val_f_avg": [], "val_f_max": [],
    }

    if len(train_ds) == 0:
        raise ValueError("train_ds is empty — nothing to train on")
    metric = cfg.train.optimum_metric
    if metric not in ("train_f_avg", "val_f_avg", "val_loss"):
        raise ValueError(f"unknown optimum_metric {metric!r} "
                         "(train_f_avg | val_f_avg | val_loss)")
    if metric.startswith("val") and len(val_ds) == 0:
        raise ValueError(
            f"optimum_metric={metric!r} needs a non-empty val split — "
            "this dataset's split left none (train_ratio / video count)")
    guard = cfg.train.nan_guard
    if guard not in ("off", "raise", "rollback"):
        raise ValueError(f"unknown nan_guard {guard!r} (off | raise | rollback)")
    nan_rollbacks = 0

    def policy_value(tr, vl):
        # larger = better (val_loss is negated)
        if metric == "train_f_avg":
            return tr[1]
        return vl[1] if metric == "val_f_avg" else -vl[0]
    for ds_name, ds in (("train_ds", train_ds), ("val_ds", val_ds)):
        for item in ds:
            # fail loudly up front: _pad_video's zero-label fallback exists
            # for label-free INFERENCE batches (reference dataloader with
            # labels=None, utils.py:16-76) — training on it would silently
            # optimize toward predicting 0, and a missing annotator mask
            # set would crash mid-eval with an opaque 0-d-iteration error
            if item.labels is None:
                raise ValueError(
                    f"{ds_name} item {item.video_id!r} has no labels — build "
                    "the dataset with annotation_fp so training has targets"
                )
            if item.gd_summary_masks is None:
                raise ValueError(
                    f"{ds_name} item {item.video_id!r} has no annotator "
                    "ground-truth masks — F-score evaluation needs the "
                    "mat/h5 annotation files"
                )

    def evaluate(ds):
        return evaluate_dataset(state, ds, cfg, classifier)

    def record(tr, vl):
        for k, v in zip(("train_loss", "train_f_avg", "train_f_max"), tr):
            history[k].append(v)
        if vl is not None:
            for k, v in zip(("val_loss", "val_f_avg", "val_f_max"), vl):
                history[k].append(v)

    # Initial (epoch -1) evaluation — reference main.py:82-146.
    tr = evaluate(train_ds)
    vl = evaluate(val_ds)
    record(tr, vl)
    if verbose:
        log_metrics("initial", tr, vl)
    if metrics_logger is not None:
        metrics_logger.log_epoch(-1, tr, vl)

    best = {"state": state, "epoch": -1, "value": policy_value(tr, vl),
            "metrics": (tr, vl)}
    # lr series aligns with the other history series (index 0 = initial)
    history["lr"] = [float(np.asarray(
        _lr_of(int(np.asarray(state.opt_state.step)))))]
    if checkpoint_dir:
        # Guarantee an "opt" checkpoint exists even if no epoch improves on
        # the initial eval (the reference only wrote opt_* on improvement,
        # main.py:255-263, leaving inference broken for flat runs).
        save_checkpoint(checkpoint_dir, state, cfg, tag="opt")
    prev_val_loss = vl[0] if vl is not None else None

    for epoch in range(state.epoch, num_epochs):
        t0 = time.time()
        if verbose:
            log_epoch_header(epoch, num_epochs)
        ep_losses, ep_favg, ep_fmax = [], [], []
        params, model_state, opt_state = state.params, state.model_state, state.opt_state
        last_good = (params, model_state, opt_state)  # refs, not copies
        for item in train_ds:
            visual, audio, labels, valid, n, text = _pad_video(item, cfg.train.subbatch_size)
            rng, vrng = jax.random.split(rng)
            audio_in = jnp.asarray(audio) if (cfg.model.audio_included and audio is not None) else None
            text_in = jnp.asarray(text) if (cfg.model.text_included and text is not None) else None
            params, model_state, opt_state, preds, loss = train_fn(
                params, model_state, opt_state, jnp.asarray(visual), audio_in,
                jnp.asarray(labels), jnp.asarray(valid), vrng, text_in,
            )
            loss_f = float(loss)
            if guard != "off" and not np.isfinite(loss_f):
                # the scan already committed this video's updates (params,
                # BN stats, Adam moments) — a non-finite loss means they are
                # poisoned (inf/NaN propagates through grads into Adam)
                if guard == "raise" or nan_rollbacks >= cfg.train.nan_guard_limit:
                    raise FloatingPointError(
                        f"non-finite training loss ({loss_f}) on video "
                        f"{item.video_id!r} at epoch {epoch}"
                        + ("" if guard == "raise" else
                           f" after {nan_rollbacks} rollbacks "
                           f"(nan_guard_limit={cfg.train.nan_guard_limit})")
                    )
                nan_rollbacks += 1
                history["nan_rollbacks"] = nan_rollbacks
                params, model_state, opt_state = last_good
                if verbose:
                    print(f"W: non-finite loss on {item.video_id!r}; rolled "
                          f"back its updates ({nan_rollbacks}/"
                          f"{cfg.train.nan_guard_limit})")
                continue  # skip this video's metrics; its updates are gone
            last_good = (params, model_state, opt_state)
            fa, fm = _video_fscores(item, np.asarray(preds)[:n], cfg)
            ep_losses.append(loss_f)
            ep_favg.append(fa)
            ep_fmax.append(fm)
        state = TrainState(params, model_state, opt_state, epoch + 1)
        # observability: the lr the NEXT optimizer step will use (the
        # schedule is a pure function of the step counter)
        history["lr"].append(float(np.asarray(
            _lr_of(int(np.asarray(state.opt_state.step))))))

        if not ep_losses:
            # every video this epoch rolled back — the run cannot progress
            raise FloatingPointError(
                f"epoch {epoch}: every training video produced a non-finite "
                "loss (all rolled back) — the data or config is bad, not one "
                "video"
            )
        tr = (float(np.mean(ep_losses)), float(np.mean(ep_favg)), float(np.mean(ep_fmax)))
        vl = evaluate(val_ds)
        record(tr, vl)

        if verbose:
            if vl is not None and prev_val_loss is not None:
                log_val_delta(vl[0], prev_val_loss)
            log_metrics(f"epoch {epoch}", tr, vl, time.time() - t0)
        if metrics_logger is not None:
            metrics_logger.log_epoch(epoch, tr, vl, time.time() - t0)
        if vl is not None:
            prev_val_loss = vl[0]

        # Optimum policy: best train-F-avg by default (reference
        # main.py:255-263); val_f_avg / val_loss select on the held-out set.
        if policy_value(tr, vl) > best["value"]:
            best = {"state": state, "epoch": epoch,
                    "value": policy_value(tr, vl), "metrics": (tr, vl)}
            if checkpoint_dir:
                save_checkpoint(checkpoint_dir, state, cfg, tag="opt")
        if checkpoint_dir and (epoch + 1) % cfg.train.checkpoint_every == 0:
            save_checkpoint(checkpoint_dir, state, cfg, tag="ckp")
        if on_epoch_end is not None:
            on_epoch_end(epoch, history, best)
        patience = cfg.train.early_stop_patience
        if patience and epoch - best["epoch"] >= patience:
            # early stopping on the SAME optimum metric the best-state
            # policy tracks; the initial eval is the first baseline
            history["early_stopped"] = True
            if verbose:
                print(f"Early stop: no {metric} improvement in "
                      f"{patience} epochs (best epoch {best['epoch']}).")
            break
        if preemption_guard is not None and preemption_guard.requested:
            # graceful preemption: persist the rolling state and exit early;
            # --checkpoint resume continues from this epoch with Adam intact
            if checkpoint_dir:
                save_checkpoint(checkpoint_dir, state, cfg, tag="ckp")
            history["preempted"] = True
            if verbose:
                print(f"Preemption requested; checkpointed at epoch {epoch} and stopping.")
            break

    if async_checkpoint and checkpoint_dir:
        _ck.wait()  # all queued writes durable before returning

    history["best_epoch"] = best["epoch"]
    return best["state"], history
