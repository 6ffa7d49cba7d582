"""Analytic roofline for the extraction program (host-side, no JAX).

XLA's cost_analysis bytes are fusion-blind (every op's operands+outputs
counted), so its "HBM floor" for the extract program (28.5 GB at b8 →
34.8 ms) is an overestimate. This script hand-counts the PERFECT-FUSION
floor instead: each conv reads its input once from HBM and writes its
output once; norm/ReLU/residual-add fuse into the producing conv's
epilogue (frozen_bn deployment — GN's stats passes would add a read);
weights are read once per program. That is the optimistic bound — real
XLA sits between the two. Geometry comes from DetectorConfig
(models/detector/backbone.py: R50 depths (3,4,6,3), FPN 256ch p2-p6,
RPN 3x3+2x1x1 per level, ROI head fc 1024; reference anchor:
Detectron2 R50-FPN, ana_bbox_generator.py:557-621).

Prints per-group FLOPs / bytes / compute-vs-HBM floors at v5e peaks
(197 TF/s bf16, 819 GB/s), the program totals, and — with --measured
'{"backbone": 32.9, ...}' (ms at the batch) — the floor multiple per
group, localizing where the measured program sits above its bound.

Usage: python scripts/roofline_extract.py [--batch 8] [--s2d]
         [--gn] [--measured JSON]
"""

import argparse
import json

PEAK_FLOPS = 197e12      # v5e bf16
PEAK_HBM = 819e9         # bytes/s
BYTES = 2                # bf16 activations


def conv(cin, cout, k, h_out, w_out, b, extra_read_ch=0):
    """One conv: FLOPs + perfect-fusion bytes. extra_read_ch models a
    fused residual add (the epilogue re-reads the shortcut tensor)."""
    flops = 2 * k * k * cin * cout * h_out * w_out * b
    # input read at the conv's own input spatial size ~= k·stride
    # geometry; close enough to read-at-output-size·stride² for the
    # cases here, so track reads explicitly at the caller's sizes.
    return flops


def run(batch, image, s2d=False, gn=False, stride_in_1x1=False,
        fc_dim=1024, rois=1000, pool=7, fpn_ch=256, anchors=3):
    b = batch
    groups = {}

    def add(group, flops, rbytes, wbytes):
        f, r, w = groups.get(group, (0, 0, 0))
        groups[group] = (f + flops, r + rbytes, w + wbytes)

    def t(h, c):                       # tensor bytes at [b, h, h, c]
        return b * h * h * c * BYTES

    # ---- stem ----
    h0 = image
    if s2d:
        # 4x4/s1 conv on the 2x2 space-to-depth grid (12 -> 64)
        add("stem", 2 * 16 * 12 * 64 * (h0 // 2) ** 2 * b,
            t(h0 // 2, 12), t(h0 // 2, 64))
    else:
        add("stem", 2 * 49 * 3 * 64 * (h0 // 2) ** 2 * b,
            t(h0, 3), t(h0 // 2, 64))
    # maxpool 3x3/2 (memory-only)
    add("stem", 0, t(h0 // 2, 64), t(h0 // 4, 64))

    # ---- residual stages (R50 bottlenecks) ----
    depths = (3, 4, 6, 3)
    chans = (256, 512, 1024, 2048)
    h = h0 // 4
    cin = 64
    for si, (d, ch) in enumerate(zip(depths, chans)):
        g = f"c{si + 2}"
        width = ch // 4
        for blk in range(d):
            stride = 2 if (blk == 0 and si > 0) else 1
            hin, hout = h, h // stride
            # conv1 1x1 (stride here iff stride_in_1x1)
            h1 = hout if stride_in_1x1 else hin
            add(g, 2 * cin * width * h1 * h1 * b,
                t(hin, cin), t(h1, width))
            # conv2 3x3 (stride here iff not stride_in_1x1)
            add(g, 2 * 9 * width * width * hout * hout * b,
                t(h1, width), t(hout, width))
            # conv3 1x1 + fused residual add (epilogue reads shortcut)
            add(g, 2 * width * ch * hout * hout * b,
                t(hout, width) + t(hout, ch), t(hout, ch))
            if blk == 0:
                # shortcut projection conv 1x1
                add(g, 2 * cin * ch * hout * hout * b,
                    t(hin, cin), t(hout, ch))
            if gn:
                # GN stats: one extra read pass per normalized tensor
                add(g, 0, t(h1, width) + t(hout, width) + t(hout, ch), 0)
            cin = ch
            h = hout

    # ---- FPN ----
    sizes = {2: h0 // 4, 3: h0 // 8, 4: h0 // 16, 5: h0 // 32}
    for lvl, ch in zip((2, 3, 4, 5), chans):
        s = sizes[lvl]
        # lateral 1x1 ch->fpn_ch
        add("fpn", 2 * ch * fpn_ch * s * s * b, t(s, ch), t(s, fpn_ch))
        # top-down upsample+add fused into the 3x3 out conv's prologue:
        # out conv reads lateral + upsampled coarser level, writes p
        up = t(sizes[lvl + 1], fpn_ch) if lvl < 5 else 0
        add("fpn", 2 * 9 * fpn_ch * fpn_ch * s * s * b,
            t(s, fpn_ch) + up, t(s, fpn_ch))
    # p6 maxpool of p5
    add("fpn", 0, t(sizes[5], fpn_ch), t(sizes[5] // 2, fpn_ch))

    # ---- RPN head (p2..p6) ----
    for s in [sizes[2], sizes[3], sizes[4], sizes[5], sizes[5] // 2]:
        add("rpn", 2 * 9 * fpn_ch * fpn_ch * s * s * b,
            t(s, fpn_ch), t(s, fpn_ch))
        add("rpn", 2 * fpn_ch * anchors * 5 * s * s * b,
            t(s, fpn_ch), t(s, anchors * 5))

    # ---- ROI head ----
    # canvas ROIAlign: pyramid p2..p5 DMA'd once per image; pooled out
    pyr = sum(t(sizes[l], fpn_ch) for l in (2, 3, 4, 5))
    pooled = b * rois * pool * pool * fpn_ch * BYTES
    # bilinear pooling as two hat matmuls per ROI (14x2 taps per axis)
    pool_flops = 2 * b * rois * fpn_ch * (2 * pool) * 48 * 2 * 14
    add("roi_align", pool_flops, pyr, pooled)
    feat = pool * pool * fpn_ch
    add("roi_fc", 2 * b * rois * feat * fc_dim, pooled,
        b * rois * fc_dim * BYTES)
    add("roi_fc", 2 * b * rois * fc_dim * fc_dim,
        b * rois * fc_dim * BYTES, b * rois * fc_dim * BYTES)
    # weights, read once per program invocation
    wbytes = (25.6e6 + feat * fc_dim + fc_dim * fc_dim) * BYTES
    add("weights", 0, wbytes, 0)

    return groups


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--image", type=int, default=1024)
    ap.add_argument("--s2d", action="store_true")
    ap.add_argument("--gn", action="store_true",
                    help="GroupNorm stats passes (default: frozen_bn)")
    ap.add_argument("--stride_in_1x1", action="store_true")
    ap.add_argument("--measured", default=None,
                    help='JSON {"group": ms, ...} to print floor multiples')
    a = ap.parse_args()

    groups = run(a.batch, a.image, s2d=a.s2d, gn=a.gn,
                 stride_in_1x1=a.stride_in_1x1)
    measured = json.loads(a.measured) if a.measured else {}
    tot_f = tot_bytes = 0.0
    print(f"perfect-fusion roofline @ batch {a.batch}, {a.image}^2, "
          f"{'s2d' if a.s2d else '7x7'} stem, "
          f"{'gn' if a.gn else 'frozen_bn'}")
    print(f"{'group':<10} {'GFLOP':>8} {'MB':>8} {'comp_ms':>8} "
          f"{'hbm_ms':>7} {'floor':>6} {'bound':>8}"
          + ("  meas_ms  x_floor" if measured else ""))
    for g, (f, r, w) in groups.items():
        byts = r + w
        cm = f / PEAK_FLOPS * 1e3
        hm = byts / PEAK_HBM * 1e3
        floor = max(cm, hm)
        row = (f"{g:<10} {f / 1e9:>8.1f} {byts / 1e6:>8.1f} {cm:>8.2f} "
               f"{hm:>7.2f} {floor:>6.2f} "
               f"{'compute' if cm > hm else 'hbm':>8}")
        if g in measured:
            row += f"  {measured[g]:>7.1f}  {measured[g] / floor:>6.2f}"
        print(row)
        tot_f += f
        tot_bytes += byts
    cm = tot_f / PEAK_FLOPS * 1e3
    hm = tot_bytes / PEAK_HBM * 1e3
    print(f"{'TOTAL':<10} {tot_f / 1e9:>8.1f} {tot_bytes / 1e6:>8.1f} "
          f"{cm:>8.2f} {hm:>7.2f} {max(cm, hm):>6.2f} "
          f"{'compute' if cm > hm else 'hbm':>8}")
    print(json.dumps({
        "batch": a.batch, "total_gflop": round(tot_f / 1e9, 1),
        "total_mb": round(tot_bytes / 1e6, 1),
        "compute_floor_ms": round(cm, 2),
        "hbm_floor_ms": round(hm, 2),
        "floor_ms": round(max(cm, hm), 2)}))


if __name__ == "__main__":
    main()
