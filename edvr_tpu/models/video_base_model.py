"""Base video SR engine (reference: basicsr/models/video_base_model.py).

Validation runs per-folder x per-frame metric accumulation; work is
process-strided (the reference strides by NCCL rank,
video_base_model.py:44) and aggregated across hosts with an allgather
at the end (replacing dist.reduce + barrier, :109-113).
"""

from __future__ import annotations

from collections import Counter
from copy import deepcopy
from os import path as osp

import numpy as np

from edvr_tpu.metrics import calculate_metric
from edvr_tpu.models.sr_model import SRModel
from edvr_tpu.parallel.dist_util import (get_dist_info,
                                         process_allreduce_sum)
from edvr_tpu.utils import get_root_logger, imwrite, tensor2img
from edvr_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class VideoBaseModel(SRModel):

    def _sample_input(self):
        import jax.numpy as jnp
        t = self.opt['network_g'].get('num_frame', 5)
        c = self.opt['network_g'].get('num_in_ch', 3)
        size = 32 if self.opt['network_g'].get('hr_in') else 16
        return jnp.zeros((1, t, size, size, c), jnp.float32)

    def _init_metric_tables(self, dataset):
        """(Re)zero the per-folder x per-frame metric tables."""
        with_metrics = self.opt['val']['metrics'] is not None
        if with_metrics and not hasattr(self, 'metric_results'):
            self.metric_results = {}
            num_frame_each_folder = Counter(dataset.data_info['folder'])
            for folder, num_frame in num_frame_each_folder.items():
                self.metric_results[folder] = np.zeros(
                    (num_frame, len(self.opt['val']['metrics'])),
                    dtype=np.float32)
        if with_metrics:
            for folder in self.metric_results:
                self.metric_results[folder][:] = 0
        return with_metrics

    def _save_result_img(self, result_img, dataset_name, folder, lq_path):
        """Write one restored frame under the reference's visualization
        layout/naming (reference: video_base_model.py:77-94)."""
        if self.opt['is_train']:
            raise NotImplementedError(
                'saving image is not supported during training.')
        if 'vimeo' in dataset_name.lower():
            split_result = lq_path.split('/')
            img_name = (f'{split_result[-3]}_{split_result[-2]}_'
                        f'{split_result[-1].split(".")[0]}')
        else:
            img_name = osp.splitext(osp.basename(lq_path))[0]
        if self.opt['val'].get('suffix'):
            save_img_path = osp.join(
                self.opt['path']['visualization'], dataset_name, folder,
                f'{img_name}_{self.opt["val"]["suffix"]}.png')
        else:
            save_img_path = osp.join(
                self.opt['path']['visualization'], dataset_name, folder,
                f'{img_name}_{self.opt["name"]}.png')
        imwrite(result_img, save_img_path)

    def _score_frame(self, result_img, gt_img, folder, frame_idx):
        for metric_idx, opt_ in enumerate(
                deepcopy(self.opt['val']['metrics']).values()):
            result = calculate_metric(
                dict(img1=result_img, img2=gt_img), opt_)
            self.metric_results[folder][int(frame_idx), metric_idx] += result

    def _finalize_validation(self, current_iter, dataset_name, tb_logger):
        # each frame was scored by exactly one process, so a sum
        # across processes reassembles the full per-frame table
        # (reference: dist.reduce + barrier, video_base_model.py:109-113)
        for folder in self.metric_results:
            self.metric_results[folder] = process_allreduce_sum(
                self.metric_results[folder])
        if get_dist_info()[0] == 0:
            self._log_validation_metric_values(current_iter, dataset_name,
                                               tb_logger)

    def dist_validation(self, dataloader, current_iter, tb_logger,
                        save_img):
        dataset = dataloader.dataset
        if (self.opt.get('val') or {}).get('clip_mode'):
            from edvr_tpu.archs.edvr_arch import EDVR
            from edvr_tpu.data.video_test_dataset import VideoTestDataset
            if isinstance(dataset, VideoTestDataset) and \
                    isinstance(self.net_g, EDVR):
                return self._clip_validation(dataset, current_iter,
                                             tb_logger, save_img)
            get_root_logger().warning(
                'val.clip_mode needs a VideoTestDataset (whole folders) '
                'and an EDVR network; falling back to the per-window '
                'protocol.')
        dataset_name = dataset.opt['name']
        with_metrics = self._init_metric_tables(dataset)
        rank, world_size = get_dist_info()

        for idx in range(rank, len(dataset), world_size):
            val_data = dataset[idx]
            val_data = {
                k: (v[None] if isinstance(v, np.ndarray) else [v])
                for k, v in val_data.items()
            }
            folder = val_data['folder'][0]
            frame_idx, max_idx = val_data['idx'][0].split('/')
            lq_path = val_data['lq_path'][0]

            self.feed_data(val_data)
            self.test()
            visuals = self.get_current_visuals()
            result_img = tensor2img([visuals['result']])
            if 'gt' in visuals:
                gt_img = tensor2img([visuals['gt']])
                del self.gt
            del self.lq
            del self.output

            if save_img:
                self._save_result_img(result_img, dataset_name, folder,
                                      lq_path)

            if with_metrics:
                self._score_frame(result_img, gt_img, folder, frame_idx)

        if with_metrics:
            self._finalize_validation(current_iter, dataset_name, tb_logger)

    def _clip_validation(self, dataset, current_iter, tb_logger, save_img):
        """Whole-clip EDVR evaluation (``val.clip_mode: true``).

        Each frame's L1/L2/L3 feature pyramid is computed ONCE per clip
        and sliding windows are restored in device batches
        (:func:`edvr_tpu.archs.edvr_arch.make_clip_restore_fn`), instead
        of the reference per-window protocol that re-extracts every
        pyramid ``num_frame`` times (reference: edvr_arch.py:376-388 via
        video_base_model.py:52-99). The output protocol — window index
        table, uint8 metric domain, save paths — is unchanged; parity
        with the per-window path is asserted in tests/test_edvr_clip.py
        and tests/test_test_cli.py. Work is process-strided by folder
        (the per-window path strides by frame) and reassembled with the
        same allreduce-sum.
        """
        import jax
        import jax.numpy as jnp

        from edvr_tpu.archs.edvr_arch import (clip_window_indices,
                                              make_clip_restore_fn)
        from edvr_tpu.data.data_util import read_img_seq

        dataset_name = dataset.opt['name']
        with_metrics = self._init_metric_tables(dataset)
        rank, world_size = get_dist_info()

        # measured-fastest default on v5e: one window per scan step —
        # throughput DROPS with window batch (clip sweep table in
        # docs/TPUDesign.md "Clip evaluation")
        win_batch = int(self.opt['val'].get('clip_win_batch', 1))
        if not hasattr(self, '_clip_fns'):
            self._clip_fns = {}
        fn = self._clip_fns.get(win_batch)
        if fn is None:
            fn = make_clip_restore_fn(self.net_g, win_batch=win_batch)
            self._clip_fns[win_batch] = fn

        variables = {'params': self.eval_params(self.params_g)}
        num_frame = dataset.opt['num_frame']
        padding = dataset.opt['padding']
        val_prec = self.opt['val'].get('matmul_precision')

        folders = list(dataset.imgs_lq.keys())
        lq_paths = {f: [] for f in folders}
        for path, folder in zip(dataset.data_info['lq_path'],
                                dataset.data_info['folder']):
            lq_paths[folder].append(path)

        for fi in range(rank, len(folders), world_size):
            folder = folders[fi]
            if dataset.cache_data:
                clip = dataset.imgs_lq[folder]
                gts = dataset.imgs_gt[folder]
            else:
                clip = read_img_seq(dataset.imgs_lq[folder])
                gts = read_img_seq(dataset.imgs_gt[folder])
            T = clip.shape[0]
            idx = jnp.asarray(clip_window_indices(T, num_frame, padding))
            clip_dev = jnp.asarray(clip, jnp.float32)
            if val_prec:
                with jax.default_matmul_precision(val_prec):
                    out = fn(variables, clip_dev, idx)
            else:
                out = fn(variables, clip_dev, idx)
            out = np.asarray(out)

            for i in range(T):
                result_img = tensor2img([out[i]])
                if save_img:
                    self._save_result_img(result_img, dataset_name, folder,
                                          lq_paths[folder][i])
                if with_metrics:
                    gt_img = tensor2img([gts[i]])
                    self._score_frame(result_img, gt_img, folder, i)

        if with_metrics:
            self._finalize_validation(current_iter, dataset_name, tb_logger)

    def nondist_validation(self, dataloader, current_iter, tb_logger,
                           save_img):
        get_root_logger().warning(
            'nondist_validation is not implemented. Run dist_validation.')
        self.dist_validation(dataloader, current_iter, tb_logger, save_img)

    def _log_validation_metric_values(self, current_iter, dataset_name,
                                      tb_logger):
        """Per-folder averaging and logging
        (reference: video_base_model.py:128-172)."""
        metric_results_avg = {
            folder: arr.mean(axis=0)
            for folder, arr in self.metric_results.items()
        }
        total_avg_results = {
            metric: 0.0
            for metric in self.opt['val']['metrics'].keys()
        }
        for folder, avg in metric_results_avg.items():
            for idx, metric in enumerate(total_avg_results.keys()):
                total_avg_results[metric] += float(avg[idx])
        for metric in total_avg_results.keys():
            total_avg_results[metric] /= len(metric_results_avg)

        # current_iter is an int while training, a checkpoint label
        # string under the test CLI
        log_str = f'Validation {dataset_name} (iter {current_iter})\n'
        for metric_idx, (metric, value) in enumerate(
                total_avg_results.items()):
            log_str += f'\t # {metric}: {value:.4f}'
            for folder, avg in metric_results_avg.items():
                log_str += f'\t # {folder}: {float(avg[metric_idx]):.4f}'
            log_str += '\n'
        get_root_logger().info(log_str)
        if tb_logger:
            for metric_idx, (metric, value) in enumerate(
                    total_avg_results.items()):
                tb_logger.add_scalar(f'metrics/{metric}', value,
                                     current_iter)
                for folder, avg in metric_results_avg.items():
                    tb_logger.add_scalar(f'metrics/{metric}/{folder}',
                                         float(avg[metric_idx]),
                                         current_iter)
