"""Training CLI: ``python -m edvr_tpu.train -opt <yml>``
(reference: basicsr/train.py).

The loop structure mirrors the reference (epoch/iter loop, message
logging, checkpoint + validation frequencies, dataset-enlarged sampler);
process identity comes from the JAX runtime instead of NCCL ranks, and
the device prefetcher overlaps host->HBM uploads with compute in place
of the CUDA-stream prefetcher.
"""

from __future__ import annotations

import argparse
import datetime
import logging
import math
import random
import time
from os import path as osp

from edvr_tpu.data import (CPUPrefetcher, EnlargedSampler, create_dataloader,
                           create_dataset)
from edvr_tpu.models import create_model
from edvr_tpu.models.base_model import load_resume_state
from edvr_tpu.parallel.dist_util import get_dist_info, init_dist
from edvr_tpu.utils import (MessageLogger, check_resume, get_env_info,
                            get_root_logger, get_time_str, init_tb_logger,
                            init_wandb_logger, make_exp_dirs,
                            set_random_seed)
from edvr_tpu.utils.options import dict2str, parse


def parse_options(is_train=True, args=None):
    """(reference: train.py:22-55)"""
    parser = argparse.ArgumentParser()
    parser.add_argument('-opt', type=str, required=True,
                        help='Path to option YAML file.')
    parser.add_argument('--launcher', choices=['none', 'jax'],
                        default='none', help='job launcher')
    parser.add_argument('--force_yml', nargs='+', default=None,
                        help='Override yml options, e.g. train:total_iter=100')
    args = parser.parse_args(args)
    opt = parse(args.opt, is_train=is_train)

    if args.force_yml is not None:
        for entry in args.force_yml:
            keys, value = entry.split('=', 1)
            node = opt
            key_parts = keys.split(':')
            for k in key_parts[:-1]:
                node = node[k]
            import yaml
            node[key_parts[-1]] = yaml.safe_load(value)

    if args.launcher == 'none':
        opt['dist'] = False
    else:
        opt['dist'] = True
        init_dist(args.launcher)
    opt['rank'], opt['world_size'] = get_dist_info()

    seed = opt.get('manual_seed')
    if seed is None:
        seed = random.randint(1, 10000)
        opt['manual_seed'] = seed
    set_random_seed(seed + opt['rank'])
    return opt


def init_loggers(opt):
    log_file = osp.join(opt['path']['log'],
                        f"train_{opt['name']}_{get_time_str()}.log")
    logger = get_root_logger(logger_name='edvr_tpu',
                             log_level=logging.INFO, log_file=log_file)
    logger.info(get_env_info())
    logger.info(dict2str(opt))

    tb_logger = None
    if opt['logger'].get('wandb') is not None and opt['logger']['wandb'].get(
            'project') is not None:
        assert opt['logger'].get('use_tb_logger') is True, (
            'should turn on tensorboard when using wandb')
        init_wandb_logger(opt)
    if opt['logger'].get('use_tb_logger'):
        tb_logger = init_tb_logger(
            log_dir=osp.join(opt['path']['root'], 'tb_logger', opt['name']))
    return logger, tb_logger


def create_train_val_dataloader(opt, logger):
    """(reference: train.py:79-125)"""
    train_loader, train_sampler, val_loader = None, None, None
    total_epochs = total_iters = 0
    for phase, dataset_opt in opt['datasets'].items():
        if phase == 'train':
            dataset_enlarge_ratio = dataset_opt.get('dataset_enlarge_ratio',
                                                    1)
            train_set = create_dataset(dataset_opt)
            train_sampler = EnlargedSampler(train_set, opt['world_size'],
                                            opt['rank'],
                                            dataset_enlarge_ratio)
            train_loader = create_dataloader(
                train_set, dataset_opt, num_gpu=opt['num_gpu'],
                dist=opt['dist'], sampler=train_sampler,
                seed=opt['manual_seed'])

            num_iter_per_epoch = math.ceil(
                len(train_set) * dataset_enlarge_ratio /
                (dataset_opt['batch_size_per_gpu'] * opt['world_size'] *
                 (1 if opt['dist'] else max(opt['num_gpu'], 1))))
            total_iters = int(opt['train']['total_iter'])
            total_epochs = math.ceil(total_iters / num_iter_per_epoch)
            logger.info(
                'Training statistics:'
                f'\n\tNumber of train images: {len(train_set)}'
                f'\n\tDataset enlarge ratio: {dataset_enlarge_ratio}'
                f'\n\tRequire iter number per epoch: {num_iter_per_epoch}'
                f'\n\tTotal epochs: {total_epochs}; iters: {total_iters}.')
        elif phase == 'val':
            val_set = create_dataset(dataset_opt)
            val_loader = create_dataloader(val_set, dataset_opt,
                                           num_gpu=opt['num_gpu'],
                                           dist=opt['dist'])
            logger.info(
                f'Number of val images/folders in {dataset_opt["name"]}: '
                f'{len(val_set)}')
        else:
            raise ValueError(f'Dataset phase {phase} is not recognized.')
    return train_loader, train_sampler, val_loader, total_epochs, total_iters


def main(args=None):
    opt = parse_options(is_train=True, args=args)

    resume_state = load_resume_state(opt)
    if resume_state is None:
        make_exp_dirs(opt)
    else:
        check_resume(opt, resume_state['iter'])

    logger, tb_logger = init_loggers(opt)

    result = create_train_val_dataloader(opt, logger)
    train_loader, train_sampler, val_loader, total_epochs, total_iters = \
        result

    model = create_model(opt)

    if resume_state:
        logger.info(f"Resuming training from epoch: {resume_state['epoch']},"
                    f" iter: {resume_state['iter']}.")
        model.resume_training(resume_state)
        start_epoch = resume_state['epoch']
        current_iter = resume_state['iter']
    else:
        start_epoch = 0
        current_iter = 0

    msg_logger = MessageLogger(opt, current_iter + 1, tb_logger)

    # prefetch_mode 'device' overlaps the host->HBM upload of the next
    # batch with the current step (reference 'cuda' mode,
    # prefetch_dataloader.py:84-126); default is the plain iterator
    prefetch_mode = opt['datasets']['train'].get('prefetch_mode')
    if prefetch_mode in ('device', 'cuda'):
        from edvr_tpu.data import DevicePrefetcher
        # feed_data re-puts device arrays, which is a no-op when the
        # sharding already matches
        prefetcher = DevicePrefetcher(
            train_loader,
            put_fn=lambda b: {
                k: model.shard_batch({'x': v})['x']
                if hasattr(v, 'ndim') else v for k, v in b.items()
            })
        logger.info(f'Use {prefetch_mode} prefetch dataloader.')
    else:
        prefetcher = CPUPrefetcher(train_loader)

    # optional profiler trace (SURVEY section 5: the reference has no
    # tracing; expose jax.profiler over a configured iteration window)
    profile_opt = opt['logger'].get('profile') or {}
    profile_start = profile_opt.get('start_iter')
    profile_end = profile_opt.get('end_iter')
    profile_dir = profile_opt.get('logdir', osp.join(
        opt['path']['log'], 'profile'))

    logger.info(f'Start training from epoch: {start_epoch}, '
                f'iter: {current_iter}')
    data_time, iter_time = time.time(), time.time()
    start_time = time.time()

    epoch = start_epoch
    while current_iter <= total_iters:
        train_sampler.set_epoch(epoch)
        prefetcher.reset()
        train_data = prefetcher.next()

        while train_data is not None:
            data_time = time.time() - data_time
            current_iter += 1
            if current_iter > total_iters:
                break
            if profile_start is not None and current_iter == profile_start:
                import jax
                jax.profiler.start_trace(profile_dir)
                logger.info(f'Started profiler trace -> {profile_dir}')
            model.feed_data(train_data)
            model.optimize_parameters(current_iter)
            if profile_end is not None and current_iter == profile_end:
                import jax
                jax.block_until_ready(model.params_g)
                jax.profiler.stop_trace()
                logger.info('Stopped profiler trace.')
            iter_time = time.time() - iter_time

            if current_iter % opt['logger']['print_freq'] == 0:
                log_vars = {'epoch': epoch, 'iter': current_iter}
                log_vars.update(
                    {'lrs': model.get_current_learning_rate(current_iter)})
                log_vars.update({'time': iter_time, 'data_time': data_time})
                log_vars.update(model.get_current_log())
                msg_logger(log_vars)

            if current_iter % opt['logger']['save_checkpoint_freq'] == 0:
                logger.info('Saving models and training states.')
                model.save(epoch, current_iter)

            if opt.get('val') is not None and (
                    current_iter % opt['val']['val_freq'] == 0):
                model.validation(val_loader, current_iter, tb_logger,
                                 opt['val'].get('save_img', False))

            data_time = time.time()
            iter_time = time.time()
            train_data = prefetcher.next()
        epoch += 1

    consumed_time = str(
        datetime.timedelta(seconds=int(time.time() - start_time)))
    logger.info(f'End of training. Time consumed: {consumed_time}')
    logger.info('Save the latest model.')
    model.save(epoch=-1, current_iter=-1)  # -1 -> 'latest'
    if opt.get('val') is not None and val_loader is not None:
        model.validation(val_loader, current_iter, tb_logger,
                         opt['val'].get('save_img', False))
    if tb_logger:
        tb_logger.close()
    return model


if __name__ == '__main__':
    main()
