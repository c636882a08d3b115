"""Speed-of-light accounting for the banded one-hot DCN kernel.

Computes, from the kernel's static geometry (dcn_band.BandGeom), the
per-call resource demands at a given shape — DMA bytes, MXU FLOPs
split into USEFUL (the deformable-conv weight contraction the op
exists to do) vs SELECTION (the one-hot gather contractions that stand
in for a hardware gather), and VPU element ops (compares, coefficient
row algebra, expansions) — and divides each by the v5e per-chip peaks
to get a component speed-of-light time. Compared against the measured
call time this shows which resource bounds the kernel and what the
formulation's floor is (docs/TPUDesign.md "Speed-of-light accounting").

No TPU needed: geometry is host code; peaks are datasheet numbers.

Usage: python scripts/dev/sol_dcn_band.py
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))

# v5e per-chip peaks (public datasheet: 197 bf16 TFLOP/s, 819 GB/s HBM).
# VPU: 8x128 lanes x 4 ALUs x ~940 MHz ~= 3.85e12 elementwise ops/s.
PEAK_BF16 = 197e12
PEAK_HBM = 819e9
PEAK_VPU = 3.85e12


def account(n, h, w, cin, cout, dg, r, bw, J, etype_bytes=2,
            stride=1, padding=1, dilation=1, kh=3, kw=3):
    from edvr_tpu.ops.dcn_band import BandGeom
    c_per = cin // dg
    SX = 128 // (2 * c_per) - 1
    tiles_x = -(-w // SX)
    g = BandGeom(n, h, tiles_x, h, w, kh, kw, dg, c_per, cout,
                 stride, padding, dilation, r=r, bw=bw, J=J)
    steps = g.n * g.By * g.Bx * g.dg          # grid steps
    K, W, NC = g.K, g.W, g.NC

    # -- DMA: one (span_y, span_tx, 128) window per grid step, etype --
    dma_bytes = steps * g.span_y * g.span_tx * 128 * etype_bytes

    # -- MXU --
    # selection: per tap, two gather contractions in the row-space
    # formulation — the select-transpose (c==gi*nch+a) and the
    # onehot^T @ window dot producing the (128, NC) gathered rows.
    # The dominant term is the window contraction: 2 * W * NC * 128.
    sel_flops = steps * K * 2 * W * NC * 128
    # useful: the tap-weight contraction — per output point,
    # K * c_per * cout MACs per deformable group.
    pts = n * h * w
    useful_flops = pts * dg * K * c_per * cout * 2
    # (equals the dense-conv FLOPs: pts * K * cin * cout * 2)

    # -- VPU (elementwise ops, order-of-magnitude) --
    # per tap per step: factor compares (span_y + span_tx) * NC, the
    # outer-product materialization W * NC, the slot blend ~4 * 128 * NC
    # lane ops, plus ~2*PX sublane broadcasts + one full multiply in
    # etype (~2 * W * NC).
    vpu_ops = steps * K * ((g.span_y + g.span_tx) * NC
                           + 3 * W * NC + 6 * 128 * NC)

    return dict(geom=g, steps=steps, dma_bytes=dma_bytes,
                sel_flops=sel_flops, useful_flops=useful_flops,
                vpu_ops=vpu_ops)


def report(tag, a, measured_ms=None):
    g = a['geom']
    t_dma = a['dma_bytes'] / PEAK_HBM * 1e3
    t_sel = a['sel_flops'] / PEAK_BF16 * 1e3
    t_use = a['useful_flops'] / PEAK_BF16 * 1e3
    t_vpu = a['vpu_ops'] / PEAK_VPU * 1e3
    print(f'== {tag} ==')
    print(f'  geometry: r={g.r} bw={g.bw} J={g.J} '
          f'span=({g.span_y},{g.span_tx} tiles) W={g.W} NC={g.NC} '
          f'grid={a["steps"]} steps')
    print(f'  DMA      {a["dma_bytes"]/1e6:9.1f} MB   '
          f'SOL {t_dma:6.2f} ms')
    print(f'  MXU sel  {a["sel_flops"]/1e12:9.2f} TFLOP SOL {t_sel:6.2f} ms'
          f'   ({a["sel_flops"]/a["useful_flops"]:.0f}x useful)')
    print(f'  MXU use  {a["useful_flops"]/1e9:9.1f} GFLOP SOL {t_use:6.2f} ms')
    print(f'  VPU      {a["vpu_ops"]/1e9:9.1f} Gop   SOL {t_vpu:6.2f} ms')
    floor = max(t_dma, t_sel + t_use, t_vpu)
    print(f'  component floor (max of independent units): {floor:.2f} ms')
    if measured_ms is not None:
        print(f'  measured kernel: {measured_ms:.1f} ms '
              f'({measured_ms / floor:.1f}x floor)')
    print()


if __name__ == '__main__':
    # EDVR-M flagship L1 shape (5 frames batched), shipped knobs
    report('infer L1 180x320 n5 dg8 (r=8 bw=64 J=2)',
           account(5, 180, 320, 64, 64, 8, r=8, bw=64, J=2),
           measured_ms=25.7)
    report('infer L2 90x160 n5 dg8', account(5, 90, 160, 64, 64, 8,
                                             r=8, bw=64, J=2))
    report('train L1 64x64 n20 dg8', account(20, 64, 64, 64, 64, 8,
                                             r=8, bw=64, J=2))
