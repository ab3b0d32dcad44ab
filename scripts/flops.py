"""Exact inference MAC/FLOP accounting for ERFNet (SURVEY.md §2a row 1).

Counts every conv/convT MAC from the architecture (ENCODER/DECODER
_LAYER_SPECS in models/erfnet.py) so the measured img/s numbers convert
to defensible TFLOP/s-effective and %-of-peak figures.  Conventions:
1 MAC = 2 FLOPs; convT MACs counted as Hin*Win*K*K*Cin*Cout (every input
pixel fans out through the full kernel); BN/ReLU/pool/argmax elementwise
work excluded (sub-1% of the total).

Usage: python scripts/flops.py [--height 512] [--width 1024]
       [--ms 0.767]   # optional measured ms/img -> efficiency printout
"""

import argparse

V5E_BF16_PEAK_TFLOPS = 197.0  # TPU v5e MXU bf16 dense peak


def erfnet_gmacs(H: int, W: int) -> float:
    """Full-net (encoder+decoder) inference MACs at input (H, W, 3)."""
    m = 0
    h, w = H // 2, W // 2
    m += h * w * 9 * 3 * 13                 # stem conv (3->13, || pool 3)
    h2, w2 = h // 2, w // 2
    m += h2 * w2 * 9 * 16 * 48              # down 16->64 (conv to 48)
    m += 5 * (h2 * w2 * 12 * 64 * 64)       # 5x nb1d C=64 (4 convs x 3 taps)
    h3, w3 = h2 // 2, w2 // 2
    m += h3 * w3 * 9 * 64 * 64              # down 64->128 (conv to 64)
    m += 8 * (h3 * w3 * 12 * 128 * 128)     # 8x dilated nb1d C=128
    m += h3 * w3 * 9 * 128 * 64             # up 128->64 (3x3 s2 convT)
    m += 2 * (h2 * w2 * 12 * 64 * 64)       # 2x nb1d C=64
    m += h2 * w2 * 9 * 64 * 16              # up 64->16
    m += 2 * (h * w * 12 * 16 * 16)         # 2x nb1d C=16
    m += h * w * 4 * 16 * 20                # head convT 2x2 s2 16->20
    return m / 1e9


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--ms", type=float, default=None,
                    help="measured ms/img to convert to TFLOP/s-effective")
    args = ap.parse_args()
    g = erfnet_gmacs(args.height, args.width)
    print(f"ERFNet @ {args.height}x{args.width}: {g:.2f} GMACs "
          f"= {2 * g:.2f} GFLOPs per image")
    rows = [(args.ms, "--ms")] if args.ms else [
        (0.767, "infer B=128 (1303 img/s)"),
        (0.854, "batch-1 device-side"),
        (24.0, "reference Titan X eval_forwardTime"),
    ]
    for ms, name in rows:
        eff = 2 * g / ms  # GFLOP / ms == TFLOP/s
        line = f"  {name}: {eff:6.1f} TFLOP/s effective"
        if ms < 10:  # our chip
            line += f" = {eff / V5E_BF16_PEAK_TFLOPS:.1%} of v5e bf16 peak"
        else:        # the reference's own card (~6.7 TFLOP/s f32)
            line += f" = {eff / 6.7:.1%} of Titan X f32 peak"
        print(line)
    # train step: fwd + dgrad + wgrad ~= 3x the conv MACs (the standard
    # approximation; the augment fold drops the dead input-layer dgrad,
    # loss/optimizer/BN-stat work is sub-% MXU FLOPs)
    gt = 3 * g
    dev_ms, batch = 21.0, 6  # r3 profiled device span at multi_step=2
    eff = 2 * gt * batch / dev_ms
    print(f"  train step (~{2 * gt:.0f} GFLOPs/img approx, batch {batch}, "
          f"{dev_ms} ms device): {eff:.1f} TFLOP/s "
          f"= {eff / V5E_BF16_PEAK_TFLOPS:.1%} of peak step-level — the "
          f"kernels themselves measure 85-90% (CLAUDE.md); the gap is BN "
          f"coefficient plumbing, epilogues, and copies, not the MXU")


if __name__ == "__main__":
    main()
