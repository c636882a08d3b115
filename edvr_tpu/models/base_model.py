"""Base training engine.

JAX counterpart of the reference BaseModel
(reference: basicsr/models/base_model.py): device placement becomes
mesh replication + sharded-batch jit (DDP equivalent, base_model.py:
55-72), per-iteration lr scheduling with linear warmup (:140-162),
network save/load with the ``params`` key (:170-262), training-state
save/resume (:264-304), and loss-dict aggregation — which on TPU is
compiled into the train step (the global-batch reduction implies the
cross-chip all-reduce) instead of a separate dist.reduce (:306-331).

State is explicit: ``self.params`` (replicated pytree), per-optimizer
``opt_state``; train steps are pure jitted functions of them.
"""

from __future__ import annotations

import os
import os.path as osp
import pickle

import jax
import numpy as np

from edvr_tpu.models.lr_scheduler import build_schedule
from edvr_tpu.parallel.dist_util import get_dist_info, master_only
from edvr_tpu.parallel.mesh import (batch_sharding, get_data_mesh,
                                    replicated_sharding)
from edvr_tpu.utils import get_root_logger

# native checkpoints are pickles of numpy pytrees behind a magic
# header: loads refuse to unpickle anything that does not declare
# itself one of ours (unpickling arbitrary files executes arbitrary
# code, so the guard is cheap insurance against a mistyped path)
CKPT_MAGIC = b'EDVRTPU.CKPT.v1\n'


def dump_checkpoint(blob, path):
    """Write a guarded native checkpoint (header + pickled pytree)."""
    with open(path, 'wb') as f:
        f.write(CKPT_MAGIC)
        pickle.dump(blob, f)


def load_checkpoint(path):
    """Read a guarded native checkpoint; refuses foreign files."""
    with open(path, 'rb') as f:
        head = f.read(len(CKPT_MAGIC))
        if head != CKPT_MAGIC:
            raise ValueError(
                f'{path} is not an edvr_tpu checkpoint (missing the '
                f'{CKPT_MAGIC!r} header) — refusing to unpickle it. '
                'Reference .pth files are converted via their own path.')
        return pickle.load(f)


class BaseModel:

    def __init__(self, opt):
        self.opt = opt
        self.is_train = opt['is_train']
        self.schedulers = {}
        self.log_dict = {}

        num_local = jax.local_device_count()
        want = opt.get('num_gpu', 1) or 1
        use = min(num_local, want) if want > 0 else 1
        self._n_proc = jax.process_count()
        self._multiprocess = bool(opt.get('dist')) and self._n_proc > 1
        if self._multiprocess:
            # multi-host: one global mesh over every process's devices,
            # so the gradient all-reduce compiled into the train step
            # spans hosts (the reference's DDP/NCCL equivalent,
            # basicsr/utils/dist_util.py:10-58)
            self.mesh = get_data_mesh(jax.devices())
            self.num_local_devices = num_local
            self.num_devices = len(jax.devices())
        else:
            self.mesh = get_data_mesh(jax.local_devices()[:use])
            self.num_local_devices = use
            self.num_devices = use
        self._replicated = replicated_sharding(self.mesh)
        self._batch_sharded = batch_sharding(self.mesh)
        # validation runs process-strided (uneven item counts across
        # processes), so eval math must stay process-local: a separate
        # local mesh keeps test steps free of cross-host collectives
        local_mesh = (get_data_mesh(jax.local_devices()[:use])
                      if self._multiprocess else self.mesh)
        self._local_replicated = replicated_sharding(local_mesh)
        self._eval_params_cache = {}

    # ------------------------------------------------------------------ #
    # device placement
    # ------------------------------------------------------------------ #
    def replicate(self, tree):
        if self._multiprocess:
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    self._replicated, np.asarray(x)), tree)
        return jax.device_put(tree, self._replicated)

    def shard_batch(self, tree):
        def put(x):
            x = np.asarray(x)
            if x.ndim > 0 and x.shape[0] % self.num_local_devices == 0:
                if self._multiprocess:
                    # this process's batch is its shard of the global one
                    return jax.make_array_from_process_local_data(
                        self._batch_sharded, x)
                return jax.device_put(x, self._batch_sharded)
            # validation batches of 1 (reference: data/__init__.py:99-101)
            # replicate instead of shard — process-locally, because
            # validation items are rank-strided
            return jax.device_put(x, self._local_replicated)

        return jax.tree_util.tree_map(put, tree)

    def eval_params(self, params):
        """Params for process-local eval steps.

        In a multi-host run the training params live on the global mesh;
        test steps consume process-local inputs, so the (replicated,
        hence host-complete) params are rehosted onto the local mesh —
        once per validation pass (cached by identity).
        """
        if not self._multiprocess:
            return params
        key = id(params)
        hit = self._eval_params_cache.get(key)
        if hit is None or hit[0] is not params:
            if len(self._eval_params_cache) > 8:
                self._eval_params_cache.clear()
            hit = (params, jax.tree_util.tree_map(
                lambda x: jax.device_put(np.asarray(x),
                                         self._local_replicated), params))
            self._eval_params_cache[key] = hit
        return hit[1]

    # ------------------------------------------------------------------ #
    # engine API (mirrors reference base_model.py:24-50)
    # ------------------------------------------------------------------ #
    def feed_data(self, data):  # pragma: no cover - abstract
        raise NotImplementedError

    def optimize_parameters(self, current_iter):  # pragma: no cover
        raise NotImplementedError

    def get_current_visuals(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def save(self, epoch, current_iter):  # pragma: no cover - abstract
        raise NotImplementedError

    def validation(self, dataloader, current_iter, tb_logger,
                   save_img=False):
        """Dispatch dist/nondist validation
        (reference: base_model.py:37-50)."""
        if self.opt.get('dist'):
            self.dist_validation(dataloader, current_iter, tb_logger,
                                 save_img)
        else:
            self.nondist_validation(dataloader, current_iter, tb_logger,
                                    save_img)

    # ------------------------------------------------------------------ #
    # learning rate
    # ------------------------------------------------------------------ #
    def setup_schedulers(self):
        """Build step->lr functions per optimizer from the YAML
        (reference: base_model.py:74-90 + lr_scheduler.py)."""
        train_opt = self.opt['train']
        for name, base_lr in self._optimizer_base_lrs().items():
            self.schedulers[name] = build_schedule(train_opt, base_lr)

    def _optimizer_base_lrs(self) -> dict:
        """Map optimizer name -> base lr; override with each optimizer."""
        return {}

    def get_current_learning_rate(self, current_iter):
        return [
            sched(current_iter) for sched in self.schedulers.values()
        ]

    # ------------------------------------------------------------------ #
    # checkpointing (reference: base_model.py:170-304)
    # ------------------------------------------------------------------ #
    @master_only
    def save_network(self, params, net_label, current_iter,
                     param_key='params', extra=None):
        """Save a params pytree as <models>/net_<label>_<iter>.ckpt with
        the reference's 'params' wrapper key (base_model.py:170-201).

        ``extra`` maps collection name -> pytree for additional mutable
        collections that torch's ``state_dict()`` carries implicitly
        (e.g. BatchNorm running stats as 'batch_stats')."""
        if current_iter == -1:
            current_iter = 'latest'
        save_filename = f'{net_label}_{current_iter}.ckpt'
        save_path = osp.join(self.opt['path']['models'], save_filename)
        os.makedirs(osp.dirname(save_path), exist_ok=True)
        blob = {param_key: jax.tree_util.tree_map(np.asarray, params)}
        for cname, tree in (extra or {}).items():
            blob[cname] = jax.tree_util.tree_map(np.asarray, tree)
        dump_checkpoint(blob, save_path)

    def load_network_collection(self, path, key):
        """Fetch an extra collection (e.g. 'batch_stats') saved alongside
        the params in a native .ckpt; None when absent (or a .pth, whose
        BN stats are handled by the converter)."""
        if path.endswith('.pth'):
            return None
        return load_checkpoint(path).get(key)

    def load_network(self, path, strict=True, param_key='params',
                     params_template=None):
        """Load network weights from a native .ckpt or a reference .pth
        (auto-converted) (reference: base_model.py:203-262)."""
        logger = get_root_logger()
        logger.info(f'Loading model from {path}.')
        if path.endswith('.pth'):
            from edvr_tpu.convert import (convert_state_dict,
                                          load_torch_weights)
            assert params_template is not None, (
                'loading a torch .pth requires a params template')
            state = load_torch_weights(path, param_key)
            params, unmatched = convert_state_dict(state, params_template)
            if unmatched:
                msg = f'Unconverted torch keys: {unmatched}'
                if strict:
                    raise ValueError(msg)
                logger.warning(msg)
            return params
        ckpt = load_checkpoint(path)
        params = ckpt.get(param_key, ckpt)
        if params_template is not None:
            t_flat = jax.tree_util.tree_structure(params_template)
            p_flat = jax.tree_util.tree_structure(params)
            if t_flat != p_flat:
                msg = (f'Checkpoint tree structure mismatch: '
                       f'{p_flat} vs {t_flat}')
                if strict:
                    raise ValueError(msg)
                logger.warning(msg)
        return params

    @master_only
    def save_training_state(self, epoch, current_iter):
        """Save optimizer/scheduler/step state as <iter>.state
        (reference: base_model.py:264-287)."""
        if current_iter == -1:
            return
        state = {
            'epoch': epoch,
            'iter': current_iter,
            'optimizers': jax.tree_util.tree_map(np.asarray,
                                                 self._optimizer_states()),
        }
        save_filename = f'{current_iter}.state'
        save_path = osp.join(self.opt['path']['training_states'],
                             save_filename)
        os.makedirs(osp.dirname(save_path), exist_ok=True)
        dump_checkpoint(state, save_path)

    def resume_training(self, resume_state):
        """Restore optimizer states (reference: base_model.py:289-304)."""
        self._load_optimizer_states(resume_state['optimizers'])

    def _optimizer_states(self):  # pragma: no cover - overridden
        return {}

    def _load_optimizer_states(self, states):  # pragma: no cover
        raise NotImplementedError

    # ------------------------------------------------------------------ #
    # logging helpers
    # ------------------------------------------------------------------ #
    def get_current_log(self):
        return self.log_dict

    def reduce_loss_dict(self, loss_dict):
        """Host-side conversion of device scalars; cross-chip averaging
        already happened inside the compiled step
        (reference: base_model.py:306-331 needed an explicit
        dist.reduce)."""
        return {k: float(v) for k, v in loss_dict.items()}

    @master_only
    def print_network(self, net, params):
        n = sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
        logger = get_root_logger()
        logger.info(
            f'Network: {net.__class__.__name__}, with parameters: {n:,d}')


def load_resume_state(opt):
    """Load a .state file for resume (reference: train.py:130-142)."""
    resume_state_path = opt['path'].get('resume_state')
    if not resume_state_path:
        return None
    return load_checkpoint(resume_state_path)
