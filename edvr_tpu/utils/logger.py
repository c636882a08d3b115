"""Logging: root logger, train-iter message formatting, TensorBoard.

Equivalent of the reference logger stack
(reference: basicsr/utils/logger.py): `get_root_logger` silences
non-master processes, `MessageLogger` formats epoch/iter/lr/ETA/losses
and mirrors scalars to TensorBoard.
"""

from __future__ import annotations

import datetime
import logging
import time

from edvr_tpu.parallel.dist_util import get_dist_info, master_only

_initialized_loggers = {}


def get_root_logger(logger_name: str = 'edvr_tpu',
                    log_level: int = logging.INFO,
                    log_file: str | None = None) -> logging.Logger:
    """Get the root logger; add a file handler on first call with a path.

    Non-master processes only log errors
    (reference: basicsr/utils/logger.py:113-149).
    """
    logger = logging.getLogger(logger_name)
    if logger_name in _initialized_loggers:
        if log_file is not None and not any(
                isinstance(h, logging.FileHandler)
                for h in logger.handlers):
            _add_file_handler(logger, log_file, log_level)
        return logger

    format_str = '%(asctime)s %(levelname)s: %(message)s'
    stream_handler = logging.StreamHandler()
    stream_handler.setFormatter(logging.Formatter(format_str))
    logger.addHandler(stream_handler)
    logger.propagate = False
    rank, _ = get_dist_info()
    if rank != 0:
        logger.setLevel('ERROR')
    else:
        logger.setLevel(log_level)
        if log_file is not None:
            _add_file_handler(logger, log_file, log_level)
    _initialized_loggers[logger_name] = True
    return logger


def _add_file_handler(logger, log_file, log_level):
    format_str = '%(asctime)s %(levelname)s: %(message)s'
    file_handler = logging.FileHandler(log_file, 'w')
    file_handler.setFormatter(logging.Formatter(format_str))
    file_handler.setLevel(log_level)
    logger.addHandler(file_handler)


class MessageLogger:
    """Format training-iteration messages with lr/time/ETA and mirror
    scalar losses to TensorBoard (reference: basicsr/utils/logger.py:8-76).
    """

    def __init__(self, opt, start_iter: int = 1, tb_logger=None):
        self.exp_name = opt['name']
        self.interval = opt['logger']['print_freq']
        self.start_iter = start_iter
        self.max_iters = opt['train']['total_iter']
        self.use_tb_logger = opt['logger'].get('use_tb_logger', False)
        self.tb_logger = tb_logger
        self.start_time = time.time()
        self.logger = get_root_logger()

    @master_only
    def __call__(self, log_vars: dict):
        epoch = log_vars.pop('epoch')
        current_iter = log_vars.pop('iter')
        lrs = log_vars.pop('lrs')

        message = (f'[{self.exp_name[:5]}..][epoch:{epoch:3d}, '
                   f'iter:{current_iter:8,d}, lr:(')
        for v in lrs:
            message += f'{v:.3e},'
        message += ')] '

        if 'time' in log_vars.keys():
            iter_time = log_vars.pop('time')
            data_time = log_vars.pop('data_time')
            total_time = time.time() - self.start_time
            time_sec_avg = total_time / (current_iter - self.start_iter + 1)
            eta_sec = time_sec_avg * (self.max_iters - current_iter - 1)
            eta_str = str(datetime.timedelta(seconds=int(eta_sec)))
            message += f'[eta: {eta_str}, '
            message += f'time (data): {iter_time:.3f} ({data_time:.3f})] '

        for k, v in log_vars.items():
            message += f'{k}: {v:.4e} '
            if self.tb_logger is not None:
                key = f'losses/{k}' if k.startswith('l_') else k
                self.tb_logger.add_scalar(key, v, current_iter)
        self.logger.info(message)


@master_only
def init_tb_logger(log_dir: str):
    try:
        from torch.utils.tensorboard import SummaryWriter
    except ImportError:
        from tensorboardX import SummaryWriter  # pragma: no cover
    return SummaryWriter(log_dir=log_dir)


@master_only
def init_wandb_logger(opt):  # pragma: no cover - external service
    """Sync-tensorboard wandb logger (reference: logger.py:87-110);
    gated on wandb availability."""
    try:
        import wandb
    except ImportError:
        get_root_logger().warning('wandb is not installed; skipping.')
        return
    logger = get_root_logger()
    project = opt['logger']['wandb']['project']
    resume_id = opt['logger']['wandb'].get('resume_id')
    if resume_id:
        wandb_id = resume_id
        resume = 'allow'
        logger.warning(f'Resume wandb logger with id={wandb_id}.')
    else:
        wandb_id = wandb.util.generate_id()
        resume = 'never'
    wandb.init(id=wandb_id, resume=resume, name=opt['name'], config=opt,
               project=project, sync_tensorboard=True)
    logger.info(f'Use wandb logger with id={wandb_id}; project={project}.')


def get_env_info() -> str:
    """Runtime environment banner (reference: logger.py:152-177)."""
    import jax
    from edvr_tpu import __version__
    msg = ('\nVersion Information:'
           f'\n\tedvr_tpu: {__version__}'
           f'\n\tJAX: {jax.__version__}'
           f'\n\tBackend: {jax.default_backend()}'
           f'\n\tDevices: {jax.device_count()} x '
           f'{jax.devices()[0].device_kind if jax.devices() else "none"}')
    return msg
