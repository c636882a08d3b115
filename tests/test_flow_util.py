"""Pin the flow IO / quantization semantics of edvr_tpu.utils.flow_util.

The quantization grid must match the files the reference toolbox
produces (basicsr/utils/flow_util.py): 255 floor-quantized levels over
[-max_val, max_val], dequantized to bin centers.
"""

import numpy as np
import pytest

from edvr_tpu.utils import flow_util


def test_quantize_grid_semantics():
    # level k covers [min + k*step, min + (k+1)*step); top values clamp
    arr = np.array([-1.0, -0.02, -0.0199, 0.0, 0.0199, 0.02, 1.0])
    q = flow_util.quantize(arr, -0.02, 0.02, 255, np.uint8)
    step = 0.04 / 255
    expect = np.minimum(
        np.floor((np.clip(arr, -0.02, 0.02) + 0.02) / step), 254)
    assert q.dtype == np.uint8
    np.testing.assert_array_equal(q, expect.astype(np.uint8))
    # dequantize maps to bin centers
    d = flow_util.dequantize(q, -0.02, 0.02, 255)
    np.testing.assert_allclose(d, (q + 0.5) * 0.04 / 255 - 0.02,
                               rtol=0, atol=0)


def test_quantize_validation():
    with pytest.raises(ValueError):
        flow_util.quantize(np.zeros(3), 0.0, 0.0, 255)
    with pytest.raises(ValueError):
        flow_util.quantize(np.zeros(3), -1.0, 1.0, 1)


def test_flow_quantize_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    h, w = 16, 24
    flow = rng.uniform(-0.5, 0.5, size=(h, w, 2)).astype(np.float32)
    dx, dy = flow_util.quantize_flow(flow, max_val=0.02, norm=True)
    assert dx.dtype == np.uint8 and dx.shape == (h, w)
    back = flow_util.dequantize_flow(dx, dy, max_val=0.02, denorm=True)
    assert back.shape == (h, w, 2)
    # in-range values reconstruct to within half a (denormalized) bin
    step = 0.04 / 255
    in_x = np.abs(flow[..., 0] / w) < 0.02
    in_y = np.abs(flow[..., 1] / h) < 0.02
    assert np.all(np.abs(back[..., 0] - flow[..., 0])[in_x] <= step * w)
    assert np.all(np.abs(back[..., 1] - flow[..., 1])[in_y] <= step * h)


def test_dequantize_flow_shape_checks():
    with pytest.raises(ValueError):
        flow_util.dequantize_flow(np.zeros((4, 4)), np.zeros((4, 5)))
    with pytest.raises(ValueError):
        flow_util.dequantize_flow(np.zeros((4, 4, 2)), np.zeros((4, 4, 2)))


def test_flo_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    flow = rng.randn(7, 9, 2).astype(np.float32)
    path = str(tmp_path / 'a.flo')
    flow_util.flowwrite(flow, path)
    # header: PIEH tag then width, height int32
    raw = open(path, 'rb').read()
    assert raw[:4] == b'PIEH'
    assert np.frombuffer(raw[4:12], np.int32).tolist() == [9, 7]
    back = flow_util.flowread(path)
    np.testing.assert_array_equal(back, flow)


def test_flo_bad_tag(tmp_path):
    path = str(tmp_path / 'bad.flo')
    with open(path, 'wb') as f:
        f.write(b'JUNK' + b'\x00' * 16)
    with pytest.raises(IOError):
        flow_util.flowread(path)


def test_quantized_png_roundtrip(tmp_path):
    cv2 = pytest.importorskip('cv2')
    del cv2
    rng = np.random.RandomState(2)
    h, w = 12, 10
    flow = rng.uniform(-0.1, 0.1, size=(h, w, 2)).astype(np.float32)
    for axis in (0, 1):
        path = str(tmp_path / f'q{axis}.png')
        flow_util.flowwrite(flow, path, quantize=True, concat_axis=axis)
        back = flow_util.flowread(path, quantize=True, concat_axis=axis)
        assert back.shape == (h, w, 2)
        step = 0.04 / 255
        assert np.abs(back[..., 0] - flow[..., 0]).max() <= step * w
        assert np.abs(back[..., 1] - flow[..., 1]).max() <= step * h
