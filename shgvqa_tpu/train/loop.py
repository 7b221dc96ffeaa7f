"""Training / evaluation loops.

The driver logic of ``agqaHGQA.py:233-455`` / ``star.py`` rebuilt around one
jitted SPMD step:

- epoch loop with early stopping after ``early_stop_patience`` stale
  validations (``agqaHGQA.py:246-255,435-442``);
- CURRENT saved every epoch, BEST keyed on the HG-head validation accuracy
  for hg tasks (``agqaHGQA.py:405,415-419``), LAST at exit (:455);
- stdout loss lines every ``log_freq`` steps (:385-388);
- train-time accuracy tracked from the hg head argmax (:394-402).

The loop is deliberately thin: batching/featurization live in the data
pipeline, device placement + collectives in parallel/, losses in train/step.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shgvqa_tpu.configs.config import Config
from shgvqa_tpu.models.shgvqa import ShgVqaModel, VideoShgVqaModel
from shgvqa_tpu.train.checkpoint import CheckpointManager
from shgvqa_tpu.train.optimizer import make_optimizer
from shgvqa_tpu.train.step import compute_losses, make_eval_step


class Trainer:
    def __init__(self, cfg: Config, steps_per_epoch: int,
                 trainable_mask=None, mesh=None, shardings=None, model=None):
        import os

        self.cfg = cfg
        self.model = model if model is not None else ShgVqaModel(cfg)
        self._t_total = int(steps_per_epoch * cfg.optim.epochs)
        self._trainable_mask = trainable_mask
        # Flat-major state (train/flat_state.py): the train state is ONE
        # lane-aligned vector — the whole optimizer+apply is ~12 fused ops
        # instead of ~500 per-leaf thunks (377 -> 295 ms/step at b32 on the
        # per-thunk-dispatch relay).  A data-parallel mesh keeps the flat
        # path: the state is replicated, batches shard over 'data', and XLA
        # emits the gradient all-reduce (flat_state.shard_flat_state).  Tree
        # mode remains for TENSOR-parallel shardings (per-leaf
        # PartitionSpecs) and as a kill switch.
        dp_only_mesh = (
            mesh is not None
            and mesh.shape.get(cfg.mesh.model_axis, 1) <= 1)
        self.flat_mode = (
            (mesh is None or dp_only_mesh) and shardings is None
            and cfg.mesh.model_parallel <= 1
            # the flat step body hardcodes BertAdam math; --optim
            # rms/adam/adamax/sgd (param.py:11-30) runs in tree mode
            and "bert" in cfg.optim.optim
            and os.environ.get("SHGVQA_FLAT_STATE", "1") == "1")
        # optimizer-tree mask: collections other than 'params' (BatchNorm
        # running stats) never enter the optimizer — they are torch BUFFERS
        # in the reference, pinned by vid_encoder.eval() (agqaHGQA.py:263)
        tm = (trainable_mask.get("params")
              if isinstance(trainable_mask, dict)
              and "params" in trainable_mask else trainable_mask)
        self.tx = make_optimizer(
            lr=cfg.optim.lr,
            t_total=self._t_total,
            warmup=cfg.optim.warmup,
            schedule=cfg.optim.schedule,
            b1=cfg.optim.b1,
            b2=cfg.optim.b2,
            eps=cfg.optim.eps,
            weight_decay=cfg.optim.weight_decay,
            grad_clip=cfg.optim.grad_clip,
            trainable_mask=tm,
            name=cfg.optim.optim,
            # flat (raveled) updates minimize kernel count but can trip a
            # libtpu horizontal-fusion layout pathology at some sizes
            # (see bert_adam_flat docstring) — opt in via SHGVQA_FLAT_OPT=1
            flat=(cfg.mesh.model_parallel <= 1
                  and os.environ.get("SHGVQA_FLAT_OPT", "0") == "1"),
        )
        self.params = None
        self.opt_state = None
        self._flat_state = None
        self._flat_spec = None
        # two-launch frozen-trunk training (see _two_launch_active)
        self._use_two_launch = False
        self._trunk_fn = None
        self._trunk_multi_fn = None
        self._trunk_vars = None
        self.step = 0
        self.ckpt = CheckpointManager(cfg.output)
        self._train_step = None
        self._eval_step = None
        self._eval_step_hg = None
        self.mesh = mesh
        self.shardings = shardings
        from shgvqa_tpu.kernels import attention as pallas_attn
        from shgvqa_tpu.train.metrics import MetricWriter, Profiler

        pallas_attn.enable(cfg.use_pallas_attention)
        pallas_attn.enable_train(cfg.use_pallas_attention_train)
        from shgvqa_tpu.kernels import ffn as pallas_ffn

        pallas_ffn.enable(cfg.use_pallas_ffn)
        pallas_ffn.enable_train(cfg.use_pallas_ffn_train)
        if cfg.use_pallas_ffn_train and cfg.use_pallas_attention_train:
            print(
                "WARNING: --pallasFFNTrain together with the (default) "
                "training attention kernel measured PATHOLOGICAL (62 vs "
                "134 clips/s at b64); pass --noPallasAttentionTrain with "
                "it or drop --pallasFFNTrain", flush=True)
        self.metrics = MetricWriter(cfg.output)
        self.profiler = Profiler(cfg.output,
                                 enabled=getattr(cfg, "profile", False))

    # -- init ------------------------------------------------------------
    def init_params(self, example_batch: Dict[str, np.ndarray]) -> None:
        rng = jax.random.PRNGKey(self.cfg.seed)
        # jit the init: op-by-op dispatch is pathologically slow on remote
        # TPU backends (each op is a round-trip), and init is one trace
        init_fn = jax.jit(
            lambda r, b: self.model.init(r, b, deterministic=True))
        self.params = init_fn(rng, example_batch)
        self._reset_opt()

    def _reset_opt(self) -> None:
        """(Re)build the optimizer state from the current self.params —
        called after init and after every weight-surgery load (the reference
        never checkpoints moments either)."""
        if self.flat_mode:
            from shgvqa_tpu.train.flat_state import (
                build_flat_state,
                shard_flat_state,
            )

            self._flat_state, self._flat_spec = build_flat_state(
                self.params, self._trainable_mask,
                layout=os.environ.get("SHGVQA_FLAT_LAYOUT", "1d"))
            if self.mesh is not None:
                # dp mesh: replicated state; batches shard in the loop
                self._flat_state = shard_flat_state(self._flat_state,
                                                    self.mesh)
            self.opt_state = None
            self._trunk_vars = None   # trunk launch re-materializes
        else:
            self._place_params()
            self.opt_state = self.tx.init(self.params["params"])
        self._train_step = None   # step closures capture the spec

    def _place_params(self) -> None:
        """Mesh placement for the params tree: replicated on a dp-only mesh,
        tensor-parallel PartitionSpecs when the model axis is >1
        (parallel/mesh.py rules).  No-op without a mesh; re-placing already
        placed arrays is free (device_put with an unchanged sharding)."""
        if self.mesh is None or self.params is None:
            return
        from shgvqa_tpu.parallel.mesh import partition_params

        shardings = partition_params(self.params, self.mesh)
        self.params = jax.tree_util.tree_map(
            jax.device_put, self.params, shardings)

    def _sync_params_from_flat(self) -> None:
        if self.flat_mode and self._flat_state is not None:
            from shgvqa_tpu.train.flat_state import flat_to_variables

            self.params = flat_to_variables(self._flat_state,
                                            self._flat_spec)

    # -- two-launch frozen-trunk training ---------------------------------
    def _two_launch_active(self) -> bool:
        """Run the frozen video trunk as its OWN jitted inference program
        feeding visual_feats into the flat train step.

        Round-5 on-chip A/B (tools/bench_train.py, b64 flagship, same day):
        the gradient-free trunk schedules ~2x slower INSIDE the
        backward-bearing program, and int8 only pays off outside it —
        two-launch int8 x4 = 170.3 clips/s vs 152.5 for the best
        single-launch bf16 (x8).  Default ON when the trunk is int8
        (--quantBackbone --freezeBackbone); SHGVQA_TWO_LAUNCH=1 forces it
        for bf16 frozen trunks, =0 kills it.  Numerics are identical to
        the single-launch step (same augment/dropout key derivation) —
        locked by tests/test_train_loop.py."""
        env = os.environ.get("SHGVQA_TWO_LAUNCH", "auto")
        if env == "0" or not self.flat_mode:
            return False
        video = (isinstance(self.model, VideoShgVqaModel)
                 and self.cfg.task != "q"
                 and not self.cfg.encoder.patches)
        if not (video and self.cfg.freeze_backbone):
            return False
        return env == "1" or bool(self.cfg.quant_backbone)

    def _get_trunk_vars(self):
        """Backbone variables for the trunk launch, materialized once (the
        trunk is frozen: its flat slices and aux collections never change;
        invalidated by _reset_opt on any load/surgery)."""
        if self._trunk_vars is None:
            from shgvqa_tpu.train.flat_state import flat_to_variables

            full = flat_to_variables(self._flat_state, self._flat_spec)
            self._trunk_vars = {
                "params": {"backbone": full["params"]["backbone"]},
                **{k: v for k, v in full.items() if k != "params"},
            }
        return self._trunk_vars

    def _trunk_batch(self, batch, step_rng):
        """frames -> visual_feats via the separate trunk program; no-op
        when two-launch is off.  The augment key matches the flat body's
        own split (r_drop, r_aug = split(rng)) so pixels are IDENTICAL to
        the single-launch step."""
        if not self._use_two_launch or "frames" not in batch:
            return batch
        r_aug = jax.random.split(step_rng)[1]
        feats = self._trunk_fn(self._get_trunk_vars(), batch["frames"],
                               r_aug)
        batch = {k: v for k, v in batch.items() if k != "frames"}
        batch["visual_feats"] = feats
        return batch

    def _build_steps(self):
        cfg, model, tx = self.cfg, self.model, self.tx

        if self.flat_mode:
            from shgvqa_tpu.train.flat_state import (
                make_flat_multi_step,
                make_flat_train_step,
            )

            if self._flat_spec is None:
                self._reset_opt()
            o = cfg.optim
            step_kw = dict(
                lr=o.lr, t_total=self._t_total,
                warmup=o.warmup, schedule=o.schedule, b1=o.b1, b2=o.b2,
                eps=o.eps, weight_decay=o.weight_decay,
                grad_clip=o.grad_clip, donate=cfg.donate_state)
            self._flat_train_step = make_flat_train_step(
                cfg, model, self._flat_spec, **step_kw)
            # --stepsPerLoop k>1: scan k steps per launch (dispatch
            # amortization, flat_state.make_flat_multi_step); partial
            # trailing chunks fall back to the single-step fn
            self._flat_multi_step = (
                make_flat_multi_step(cfg, model, self._flat_spec, **step_kw)
                if cfg.steps_per_loop > 1 else None)
            self._train_step = True   # sentinel: steps are built
            self._eval_step = jax.jit(make_eval_step(cfg, model))
            self._eval_step_hg = jax.jit(
                make_eval_step(cfg, model, with_hg_metrics=True))

            self._use_two_launch = self._two_launch_active()
            if self._use_two_launch:
                def trunk(variables, frames, r_aug):
                    return model.apply(
                        variables, {"frames": frames}, False,
                        rngs={"augment": r_aug}, method="encode_frames")

                # multi-step chunks: ONE launch scans k sequential trunk
                # applies (per-step activation peak, k-step dispatch
                # amortization); each step's augment key is derived exactly
                # as the flat body would (split(rng)[1])
                def trunk_multi(variables, frames_k, rngs):
                    def body(c, inp):
                        f, k = inp
                        return c, trunk(variables, f,
                                        jax.random.split(k)[1])

                    return jax.lax.scan(body, None, (frames_k, rngs))[1]

                self._trunk_fn = jax.jit(trunk)
                self._trunk_multi_fn = jax.jit(trunk_multi)
            return

        def loss_fn(params_col, aux_cols, batch, rng):
            r_drop, r_aug = jax.random.split(rng)
            outputs = model.apply(
                {"params": params_col, **aux_cols}, batch,
                deterministic=False,
                rngs={"dropout": r_drop, "augment": r_aug})
            return compute_losses(cfg, outputs, batch)

        def train_step(variables, opt_state, batch, rng):
            # differentiate ONLY the 'params' collection: BatchNorm running
            # stats are buffers in the reference (vid_encoder.eval()),
            # not parameters — they get no gradient and no update
            params_col = variables["params"]
            aux_cols = {k: v for k, v in variables.items() if k != "params"}
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params_col, aux_cols, batch, rng)
            updates, opt_state = tx.update(grads, opt_state, params_col)
            import optax
            params_col = optax.apply_updates(params_col, updates)
            return {"params": params_col, **aux_cols}, opt_state, metrics

        donate = (0, 1) if cfg.donate_state else ()
        self._train_step = jax.jit(train_step, donate_argnums=donate)
        self._eval_step = jax.jit(make_eval_step(cfg, model))
        self._eval_step_hg = jax.jit(
            make_eval_step(cfg, model, with_hg_metrics=True))

    # -- training ---------------------------------------------------------
    def train(
        self,
        train_batches: Callable[[int], Iterable[Dict[str, np.ndarray]]],
        evaluate: Optional[Callable[["Trainer"], Tuple[float, float]]] = None,
        log: Optional[Callable[[str], None]] = None,
    ) -> Dict[str, Any]:
        """train_batches(epoch) yields batch dicts (jax-ready arrays plus a
        'ques_id' list popped before device transfer).  evaluate(self) ->
        (valid_score, hg_score)."""
        cfg = self.cfg
        if log is None:
            log = self.metrics.log   # stdout + {output}/log.log (star.py:385)
        if self._train_step is None:
            self._build_steps()
        rng = jax.random.PRNGKey(cfg.seed)
        best = 0.0
        stale = 0
        history = []
        try:
            for epoch in range(cfg.optim.epochs):
                if evaluate is not None and stale >= cfg.optim.early_stop_patience:
                    log(f"Early stopping at epoch {epoch} "
                        f"(no improvement for {stale} validations)")
                    break
                t0 = time.time()
                n_steps = 0
                # --stepsPerLoop: group k batches into one scanned launch
                # (flat mode; bit-identical to k single steps — the same
                # per-step keys are fed through the scan)
                k_loop = (cfg.steps_per_loop
                          if self.flat_mode
                          and getattr(self, "_flat_multi_step", None)
                          is not None else 1)
                chunk, chunk_rngs = [], []

                def log_step(step, metrics, row=None):
                    if step % cfg.log_freq == 0:
                        m = {k: float(v if row is None else v[row])
                             for k, v in metrics.items()}
                        parts = " ".join(
                            f"{k}={v:0.4f}" for k, v in m.items())
                        log(f"Epoch {epoch} step {step}: {parts}")
                        self.metrics.write(step, m, epoch=epoch)

                def run_chunk():
                    nonlocal n_steps
                    stacked = jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs), *chunk)
                    if self.mesh is not None:
                        from shgvqa_tpu.parallel.mesh import shard_batch

                        stacked = shard_batch(stacked, self.mesh, axis=1)
                    rngs = jnp.stack(chunk_rngs)
                    if self._use_two_launch and "frames" in stacked:
                        feats_k = self._trunk_multi_fn(
                            self._get_trunk_vars(), stacked["frames"], rngs)
                        stacked = {k: v for k, v in stacked.items()
                                   if k != "frames"}
                        stacked["visual_feats"] = feats_k
                    self._flat_state, metrics = self._flat_multi_step(
                        self._flat_state, stacked, rngs)
                    for i in range(len(chunk)):
                        log_step(self.step, metrics, row=i)
                        self.profiler.step(self.step)
                        self.step += 1
                        n_steps += 1

                for batch in train_batches(epoch):
                    batch = dict(batch)
                    batch.pop("ques_id", None)
                    if self.mesh is not None:
                        from shgvqa_tpu.parallel.mesh import shard_batch

                        batch = shard_batch(batch, self.mesh)
                    rng, step_rng = jax.random.split(rng)
                    if k_loop > 1:
                        chunk.append(batch)
                        chunk_rngs.append(step_rng)
                        if len(chunk) == k_loop:
                            run_chunk()
                            chunk, chunk_rngs = [], []
                        continue
                    if self.flat_mode:
                        batch = self._trunk_batch(batch, step_rng)
                        self._flat_state, metrics = self._flat_train_step(
                            self._flat_state, batch, step_rng)
                    else:
                        self.params, self.opt_state, metrics = \
                            self._train_step(
                                self.params, self.opt_state, batch, step_rng)
                    log_step(self.step, metrics)
                    self.profiler.step(self.step)
                    self.step += 1
                    n_steps += 1
                # trailing partial chunk: single-step fallback
                for batch, step_rng in zip(chunk, chunk_rngs):
                    if self.mesh is not None:
                        from shgvqa_tpu.parallel.mesh import shard_batch

                        batch = shard_batch(batch, self.mesh)
                    batch = self._trunk_batch(batch, step_rng)
                    self._flat_state, metrics = self._flat_train_step(
                        self._flat_state, batch, step_rng)
                    log_step(self.step, metrics)
                    self.profiler.step(self.step)
                    self.step += 1
                    n_steps += 1
                dt = time.time() - t0
                log(f"Epoch {epoch}: {n_steps} steps in {dt:0.1f}s")
                # flat mode trains on the raveled state; materialize the
                # tree once per epoch for eval/checkpoints
                self._sync_params_from_flat()
                self.ckpt.save("CURRENT", self.state_dict())

                if evaluate is not None:
                    valid_score, hg_score = evaluate(self)
                    key_score = (
                        hg_score if cfg.task in ("hgqa", "vhga", "hgvqa")
                        else valid_score
                    )
                    log(f"Epoch {epoch}: valid {valid_score*100:0.2f} "
                        f"hg {hg_score*100:0.2f} best {best*100:0.2f}")
                    if key_score > best:
                        best = key_score
                        self.ckpt.save("BEST", self.state_dict())
                        stale = 0
                    else:
                        stale += 1
                    history.append(
                        {"epoch": epoch, "valid": valid_score, "hg": hg_score}
                    )
        finally:
            self._sync_params_from_flat()
            self.ckpt.save("LAST", self.state_dict())
        return {"best": best, "history": history, "steps": self.step}

    # -- evaluation -------------------------------------------------------
    def predict(self, batches: Iterable[Dict[str, np.ndarray]],
                return_hg_metrics: bool = False):
        """Returns (quesid2ans from logit, quesid2ans from hg_logit); with
        ``return_hg_metrics`` additionally the Hungarian-matched rel/act
        class accuracy computed in the SAME forward pass (or None when the
        batches carry no HG labels) — one forward per valid epoch, the
        reference's in-predict class accuracy (``agqaHGQA.py:548-559``).

        Dispatches every batch asynchronously and fetches predictions in one
        pass at the end: on remote-relay TPU backends a host fetch costs
        hundreds of ms regardless of size, so per-batch fetches would
        dominate the eval loop."""
        if self._eval_step is None:
            self._build_steps()
        eval_fn = (self._eval_step_hg if return_hg_metrics
                   else self._eval_step)
        self._place_params()
        pending = []
        for batch in batches:
            batch = dict(batch)
            ques_ids = batch.pop("ques_id")
            n_valid = batch.pop("n_valid", len(ques_ids))
            if self.mesh is not None:
                from shgvqa_tpu.parallel.mesh import shard_batch

                batch = shard_batch(batch, self.mesh)
            preds = eval_fn(self.params, batch)
            pending.append((ques_ids, n_valid, preds))

        quesid2ans: Dict[str, int] = {}
        hg_quesid2ans: Dict[str, int] = {}
        if not pending:
            if return_hg_metrics:
                return quesid2ans, hg_quesid2ans, None
            return quesid2ans, hg_quesid2ans
        hg_acc = None
        if return_hg_metrics and "rel_class_acc" in pending[0][2]:
            # per-batch scalars, mean over batches — identical semantics to
            # the retired second-pass evaluate_hg_accuracy (same batches,
            # padding rows included); single fetch for the whole split.
            # (Scalars are replicated, so this also works multi-host.)
            stacked = np.asarray(jnp.stack(
                [jnp.stack((p["rel_class_acc"], p["act_class_acc"]))
                 for _, _, p in pending]))
            hg_acc = {"rel_class_acc": float(stacked[:, 0].mean()),
                      "act_class_acc": float(stacked[:, 1].mean())}
        if jax.process_count() > 1:
            # each host scores the rows IT fed (its addressable shards of
            # the batch-sharded outputs line up with its local ques_ids +
            # host-local n_valid from the Batcher), then the per-host maps
            # are merged so every process returns the full split
            from shgvqa_tpu.parallel.distributed import allgather_object
            from shgvqa_tpu.parallel.mesh import local_rows

            for ques_ids, n_valid, preds in pending:
                la = local_rows(preds["answer"])
                lh = local_rows(preds.get("hg_answer", preds["answer"]))
                for i, qid in enumerate(ques_ids[:n_valid]):
                    quesid2ans[qid] = int(la[i])
                    hg_quesid2ans[qid] = int(lh[i])
            merged: Dict[str, int] = {}
            merged_hg: Dict[str, int] = {}
            for part in allgather_object(
                    [quesid2ans, hg_quesid2ans]):
                merged.update(part[0])
                merged_hg.update(part[1])
            if return_hg_metrics:
                return merged, merged_hg, hg_acc
            return merged, merged_hg
        all_ans = np.asarray(jnp.concatenate(
            [p["answer"] for _, _, p in pending]))
        all_hg = np.asarray(jnp.concatenate(
            [p.get("hg_answer", p["answer"]) for _, _, p in pending]))
        offset = 0
        for ques_ids, n_valid, preds in pending:
            bs = int(preds["answer"].shape[0])
            for i, qid in enumerate(ques_ids[:n_valid]):
                quesid2ans[qid] = int(all_ans[offset + i])
                hg_quesid2ans[qid] = int(all_hg[offset + i])
            offset += bs
        if return_hg_metrics:
            return quesid2ans, hg_quesid2ans, hg_acc
        return quesid2ans, hg_quesid2ans

    def evaluate_hg_accuracy(self, batches: Iterable[Dict[str, np.ndarray]]
                             ) -> Dict[str, float]:
        """Hungarian-matched rel/act top-1 accuracy over a split — the
        reference logs this during predict (star.py:549-550,
        agqaHGQA.py:550-559) as a probe of the HG decoder.

        Standalone second-pass variant: the product eval path gets the
        same numbers from ``predict(..., return_hg_metrics=True)`` in one
        forward (locked equal by tests/test_train_loop.py); this remains
        for scoring a split when no predictions are wanted."""
        import jax.numpy as jnp

        from shgvqa_tpu.losses.set_prediction import (
            empty_weight,
            hungarian_set_loss,
        )

        cfg = self.cfg
        model = self.model

        @jax.jit
        def hg_metrics(params, batch):
            out = model.apply(params, batch, deterministic=True)
            rel_w = empty_weight(cfg.num_rel_classes + 1, cfg.eos_coef)
            act_w = empty_weight(cfg.num_act_classes + 1, cfg.eos_coef)
            rel = hungarian_set_loss(
                out["rel_preds"], batch["rel_labels"], batch["rel_lengths"],
                rel_w, per_frame=cfg.loss_hg_per_frame,
                num_situations=cfg.data.num_situations)
            act = hungarian_set_loss(
                out["act_preds"], batch["act_labels"], batch["act_lengths"],
                act_w, per_frame=cfg.loss_hg_per_frame,
                num_situations=cfg.data.num_situations)
            return (100.0 - rel["class_error"], 100.0 - act["class_error"])

        self._place_params()
        pending = []
        for batch in batches:
            batch = dict(batch)
            batch.pop("ques_id", None)
            batch.pop("n_valid", None)
            if self.mesh is not None:
                from shgvqa_tpu.parallel.mesh import shard_batch

                batch = shard_batch(batch, self.mesh)
            pending.append(hg_metrics(self.params, batch))
        if not pending:
            return {"rel_class_acc": 0.0, "act_class_acc": 0.0}
        # single fetch for all batches (relay fetch latency amortization)
        stacked = np.asarray(jnp.stack(
            [jnp.stack(p) for p in pending]))
        return {
            "rel_class_acc": float(stacked[:, 0].mean()),
            "act_class_acc": float(stacked[:, 1].mean()),
        }

    # -- state ------------------------------------------------------------
    def state_dict(self):
        if self.flat_mode:
            st = self._flat_state
            # layout recorded as an int code (orbax-friendly): restores
            # compare layouts EXPLICITLY instead of inferring from array
            # length (flat_state.LAYOUT_CODES; advisor round-4 finding —
            # a coincidental length match must not scramble the moments)
            from shgvqa_tpu.train.flat_state import LAYOUT_CODES

            return {
                "params": self.params,
                "opt_state": {
                    "m": st.m, "v": st.v,
                    "layout_code": np.int32(
                        LAYOUT_CODES[self._flat_spec.layout]),
                } if st is not None else None,
                "step": self.step,
            }
        return {
            "params": self.params,
            "opt_state": self.opt_state,
            "step": self.step,
        }

    # -- encoder-only snapshots (entry.py:203-238 '%s_LXRT.pth' analog) ----
    @staticmethod
    def _encoder_root(ptree):
        """(container, key) such that container[key] is the lxrt/bert_encoder
        subtree.  VideoShgVqaModel nests the task model under 'head'
        (models/shgvqa.py), feature-input models keep it at top level."""
        for owner in (ptree, ptree.get("head", {})):
            for key in ("lxrt", "bert_encoder"):
                if key in owner:
                    return owner, key
        raise ValueError(
            "no encoder subtree (lxrt/bert_encoder) in params")

    def save_encoder(self, path: str) -> None:
        """Save only the language/tri-stream encoder subtree (the reference's
        LXMERT-style '%s_LXRT.pth' snapshots)."""
        owner, key = self._encoder_root(self.params["params"])
        sub = {key: owner[key]}
        self.ckpt._ckptr.save(
            self.ckpt.path(path + "_LXRT") if "/" not in path
            else path + "_LXRT",
            jax.device_get(sub), force=True)

    def load_encoder(self, path: str) -> None:
        """--loadLXMERT: restore encoder weights into the current params,
        leaving heads/decoders at their init (the reference loads with
        strict=False and prints the diff, entry.py:224-238)."""
        import os as _os

        full = path + "_LXRT" if not path.endswith("_LXRT") else path
        if not _os.path.isabs(full):
            full = self.ckpt.path(full)
        restored = self.ckpt._ckptr.restore(full)
        params = jax.device_get(self.params)
        owner, own_key = self._encoder_root(params["params"])

        # name-matched partial load, NOT a wholesale subtree swap: the
        # snapshot may come from a differently-configured encoder (e.g. a
        # capsule-path pretraining run restored into a --noCaps model) and
        # the reference tolerates that by loading strict=False and printing
        # the diff (entry.py:224-238).
        def walk(dst, src, prefix, stats):
            for key, sval in src.items():
                name = f"{prefix}/{key}"
                if not isinstance(dst, dict) or key not in dst:
                    stats["unexpected"].append(name)
                elif isinstance(sval, dict):
                    walk(dst[key], sval, name, stats)
                elif getattr(dst[key], "shape", None) != \
                        getattr(sval, "shape", None):
                    stats["shape_mismatch"].append(
                        f"{name} {getattr(sval, 'shape', None)}->"
                        f"{getattr(dst[key], 'shape', None)}")
                else:
                    dst[key] = jnp.asarray(sval)
                    stats["loaded"] += 1

        stats = {"loaded": 0, "unexpected": [], "shape_mismatch": []}
        for key, subtree in restored.items():
            if key == own_key and isinstance(subtree, dict):
                walk(owner[key], subtree, key, stats)
            else:
                stats["unexpected"].append(key)
        self.params = params
        msg = (f"Loaded encoder snapshot from {full}: "
               f"{stats['loaded']} tensors")
        if stats["unexpected"]:
            msg += (f"; not in model ({len(stats['unexpected'])}): "
                    f"{stats['unexpected'][:8]}")
        if stats["shape_mismatch"]:
            msg += (f"; shape mismatch ({len(stats['shape_mismatch'])}): "
                    f"{stats['shape_mismatch'][:8]}")
        self.metrics.log(msg)
        # optimizer moments restart (the reference never checkpoints them)
        self._reset_opt()

    def load_backbone(self, path: str) -> None:
        """Load converted pretrained backbone weights (params + BatchNorm
        running stats) from a tools/convert_slow_r50.py msgpack -- the
        torch.hub ``pretrained=True`` analog (video_encoder.py:43-51)."""
        from flax.serialization import msgpack_restore

        params = jax.device_get(self.params)
        if "backbone" not in params["params"]:
            raise ValueError("model has no backbone subtree (q-only or "
                             "feature-input model)")
        with open(path, "rb") as f:
            tree = msgpack_restore(f.read())
        params["params"]["backbone"] = jax.tree_util.tree_map(
            jnp.asarray, tree["params"])
        if tree.get("batch_stats"):
            params.setdefault("batch_stats", {})["backbone"] = \
                jax.tree_util.tree_map(jnp.asarray, tree["batch_stats"])
        self.params = params
        n = len(jax.tree_util.tree_leaves(tree))
        self.metrics.log(f"Loaded pretrained backbone from {path} "
                         f"({n} tensors incl. BN stats)")
        self._reset_opt()

    def load_lxmert_qa(self, path: str, label2ans) -> None:
        """load_lxmert_qa (qa_answer_table.py:84-158): restore an LXMERT
        pretraining snapshot's encoder AND initialize the fine-tune answer
        head from the pretraining QA head by answer-string matching; labels
        whose answers were not pretrained get ZEROED rows."""
        from shgvqa_tpu.models.pretrain import AnswerTable, answer_head_surgery

        self.load_encoder(path)
        base = path[:-len("_LXRT")] if path.endswith("_LXRT") else path
        qa = np.load(base + "_qa_head.npz", allow_pickle=True)
        table = AnswerTable([str(a) for a in qa["answers"]])
        params = jax.device_get(self.params)
        tree = params["params"]
        if "logit_fc" not in tree:          # VideoShgVqaModel nests the
            tree = tree["head"]             # task model under 'head'
        head = tree["logit_fc"]["fc2"]["Dense_0"]
        new_w, new_b, loaded, unloaded = answer_head_surgery(
            qa["weight"], qa["bias"],
            np.asarray(head["kernel"]).T, np.asarray(head["bias"]),
            label2ans, table)
        head["kernel"] = jnp.asarray(new_w.T)
        head["bias"] = jnp.asarray(new_b)
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.metrics.log(
            f"load_lxmert_qa: {loaded} answers initialized from "
            f"pretraining, {unloaded} zeroed")
        self._reset_opt()

    def load_bert_pretrained(self, path: str) -> None:
        """Non---fromScratch path: overwrite the language tower (embeddings +
        l-layers + single-CLS pooler) with bert-base weights, replicating the
        reference's name-matched partial load
        (modeling_capsbert.py:1654-1785 via entry.py:155-168)."""
        from shgvqa_tpu.utils.torch_import import (
            bert_to_lxrt_params,
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(path)
        params = jax.device_get(self.params)
        owner, key = self._encoder_root(params["params"])
        sub, report = bert_to_lxrt_params(sd, owner[key])
        owner[key] = jax.tree_util.tree_map(jnp.asarray, sub)
        self.params = params
        self.metrics.log(
            f"Loaded BERT pretrained weights from {path} into '{key}': "
            f"{len(report['loaded'])} tensors"
            + (f"; skipped {len(report['skipped'])}"
               if report["skipped"] else ""))
        self._reset_opt()

    def load_vit_layers(self, path: str, start_index: int = 7) -> None:
        """--vitInit: overwrite the visual-stream r_layers with pretrained
        ViT-B/32 blocks ``blocks[start_index:start_index+r]`` (the
        reference's ``load_vit_layers``, modeling_capsbert.py:1365-1390).
        Requires the model built with ``encoder.vit_init=True`` (r_layers
        are pre-LN ViTBlocks, models/vit.py)."""
        from shgvqa_tpu.utils.torch_import import (
            load_torch_state_dict,
            vit_to_r_layers,
        )

        params = jax.device_get(self.params)
        owner, key = self._encoder_root(params["params"])
        enc = owner[key]["encoder"]
        n = 0
        while f"r_{n}" in enc:
            n += 1
        if n == 0:
            raise ValueError("model has no r_layers to initialize")
        if "norm1" not in enc["r_0"]:
            raise ValueError(
                "r_layers are BertLayers, not ViT blocks — build the model "
                "with encoder.vit_init=True (--vitInit) before loading")
        sub = vit_to_r_layers(load_torch_state_dict(path), n, start_index)
        for name, block in sub.items():
            enc[name] = jax.tree_util.tree_map(
                lambda old, new: jnp.asarray(
                    new, dtype=np.asarray(old).dtype), enc[name], block)
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.metrics.log(
            f"Loaded {n} ViT blocks [{start_index}:{start_index + n}] "
            f"from {path} into '{key}/encoder/r_*'")
        self._reset_opt()

    def load_reference(self, path: str) -> None:
        """--load on a reference ``.pth``: transplant a trained AGQAModel/
        STARModel state_dict (torch) into the current params — the TPU
        product path for the reference's eval-from-checkpoint contract
        (``agqaHGQA.py:859-874``).  Optimizer state restarts fresh (the
        reference never checkpointed it, SURVEY.md §5)."""
        from shgvqa_tpu.utils.ref_import import (
            load_reference_checkpoint,
            reference_to_variables,
        )

        sd = load_reference_checkpoint(path)
        variables, report = reference_to_variables(
            sd, jax.device_get(self.params), self.cfg)
        self.params = jax.tree_util.tree_map(jnp.asarray, variables)
        self.metrics.log(
            f"Imported reference checkpoint {path}: "
            f"{len(report['mapped'])} tensors"
            + (f"; skipped {report['skipped']}" if report["skipped"] else ""))
        self._reset_opt()

    def load(self, name_or_path: str) -> None:
        import os as _os

        if name_or_path.endswith(".pth") or (
                not _os.path.isdir(name_or_path)
                and _os.path.isfile(name_or_path + ".pth")):
            # a reference torch snapshot, not one of our orbax checkpoints
            self.load_reference(name_or_path)
            return
        # Restore against a HOST-side template: orbax materializes the
        # checkpoint as host numpy, so no device memory is touched during
        # the restore itself; the old init-time device state is freed only
        # AFTER a successful restore, right before re-placement — the
        # load-path device peak stays halved (one copy on device at a time)
        # while a FAILED restore leaves the live training state intact
        # (advisor round-4 finding: nulling first clobbered the Trainer).
        def host_zero(x):
            if hasattr(x, "shape") and hasattr(x, "dtype"):
                return np.zeros(jnp.shape(x), np.dtype(x.dtype))
            return x

        template = jax.tree_util.tree_map(host_zero, self.state_dict())
        try:
            state = self.ckpt.restore(name_or_path, template=template)
        except Exception:
            if not self.flat_mode:
                raise
            # shape-mismatched template — the checkpoint was written under
            # another flat layout (or without the layout_code field);
            # raw-restore and repack below
            state = self.ckpt.restore(name_or_path)
        self.params = None
        self._flat_state = None
        self.opt_state = None
        self.params = state["params"]
        if self.flat_mode:
            self._reset_opt()   # rebuilds flat from restored params
            if state.get("opt_state") is not None:
                # repack: the checkpoint may have been written under the
                # other flat layout ((N/256,256) vs (N,))
                from shgvqa_tpu.train.flat_state import (
                    layout_from_code,
                    repack_like,
                )

                stored = layout_from_code(
                    state["opt_state"].get("layout_code"))
                self._flat_state = self._flat_state._replace(
                    m=repack_like(state["opt_state"]["m"], self._flat_spec,
                                  layout=stored),
                    v=repack_like(state["opt_state"]["v"], self._flat_spec,
                                  layout=stored),
                    step=jnp.asarray(int(state["step"]), jnp.int32))
        else:
            self._place_params()
            opt_state = state["opt_state"]
            if self.mesh is not None and opt_state is not None:
                # re-place the host-restored moments onto the mesh: under
                # TP they must follow their params' PartitionSpecs (the
                # pre-round-4 device template gave this implicitly), else
                # the first step replicates them per device (advisor
                # round-4 medium finding)
                from shgvqa_tpu.parallel.mesh import partition_opt_state

                shardings = partition_opt_state(
                    opt_state, self.params["params"], self.mesh)
                opt_state = jax.tree_util.tree_map(
                    jax.device_put, opt_state, shardings)
            self.opt_state = opt_state
        self.step = int(state["step"])
