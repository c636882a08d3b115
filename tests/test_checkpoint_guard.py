"""Native checkpoints carry a magic header; loads refuse to unpickle
anything else (a mistyped path must not execute arbitrary pickle)."""

import pickle

import numpy as np
import pytest

from edvr_tpu.models.base_model import (CKPT_MAGIC, dump_checkpoint,
                                        load_checkpoint)


def test_checkpoint_roundtrip_and_guard(tmp_path):
    blob = {'params': {'w': np.arange(4.0)}}
    path = str(tmp_path / 'net_g_1.ckpt')
    dump_checkpoint(blob, path)
    with open(path, 'rb') as f:
        assert f.read(len(CKPT_MAGIC)) == CKPT_MAGIC
    loaded = load_checkpoint(path)
    np.testing.assert_array_equal(loaded['params']['w'], blob['params']['w'])

    # a bare pickle (no header) is refused, not unpickled
    bare = str(tmp_path / 'foreign.ckpt')
    with open(bare, 'wb') as f:
        pickle.dump(blob, f)
    with pytest.raises(ValueError, match='not an edvr_tpu checkpoint'):
        load_checkpoint(bare)
