from edvr_tpu.utils.img_util import (crop_border, imfrombytes, img2tensor,
                                     imwrite, tensor2img)
from edvr_tpu.utils.logger import (MessageLogger, get_env_info,
                                   get_root_logger, init_tb_logger,
                                   init_wandb_logger)
from edvr_tpu.utils.misc import (check_resume, get_time_str, make_exp_dirs,
                                 mkdir_and_rename, scandir, set_random_seed,
                                 sizeof_fmt)
from edvr_tpu.utils.options import dict2str, parse


def __getattr__(name):
    # API-familiarity re-export: the reference exposes FileClient from
    # its utils package (basicsr/utils/__init__.py)
    if name == 'FileClient':
        from edvr_tpu.data.file_client import FileClient
        return FileClient
    raise AttributeError(name)

__all__ = [
    'crop_border', 'imfrombytes', 'img2tensor', 'imwrite', 'tensor2img',
    'MessageLogger', 'get_env_info', 'get_root_logger', 'init_tb_logger',
    'init_wandb_logger', 'check_resume', 'get_time_str', 'make_exp_dirs',
    'mkdir_and_rename', 'scandir', 'set_random_seed', 'sizeof_fmt',
    'dict2str', 'parse', 'FileClient'
]
