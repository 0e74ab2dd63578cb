"""TracingRangeEncoder: logs every symbol as a resolved primitive op in
the device plan format, for diffing scalar vs batched symbol streams."""
import numpy as np

from opus_codec_tpu.bitstream.range_coder import RangeEncoder


class TracingRangeEncoder(RangeEncoder):
    def __init__(self, size):
        super().__init__(size)
        self.oplog = []

    def encode(self, fl, fh, ft):
        self.oplog.append((0, fl, fh, ft))
        super().encode(fl, fh, ft)

    def encode_bin(self, fl, fh, bits):
        self.oplog.append((1, fl, fh, bits))
        super().encode_bin(fl, fh, bits)

    def enc_bit_logp(self, val, logp):
        self.oplog.append((2, 1 if val else 0, 0, logp))
        super().enc_bit_logp(val, logp)

    def enc_icdf(self, s, icdf, ftb):
        ft = 1 << ftb
        fl = ft - int(icdf[s - 1]) if s > 0 else 0
        fh = ft - int(icdf[s])
        self.oplog.append((1, fl, fh, ftb))
        super().enc_icdf(s, icdf, ftb)

    def enc_bits(self, fl, bits):
        self.oplog.append((5, int(fl), 0, int(bits)))
        super().enc_bits(fl, bits)


def trace_scalar_celt(enc, pcm, N, nbytes):
    """Run CeltEncoder.encode_with_ec with a tracing coder injected.

    Returns (packet_bytes, oplog). Uses the own-enc path semantics by
    pre-creating the coder the encoder would create."""
    import opus_codec_tpu.celt.encoder as ce

    log = {}
    orig_cls = ce.RangeEncoder

    class Hook(TracingRangeEncoder):
        def __init__(self, size):
            super().__init__(size)
            log["enc"] = self

    ce.RangeEncoder = Hook
    try:
        out = enc.encode_with_ec(pcm, N, nbytes)
    finally:
        ce.RangeEncoder = orig_cls
    return out, log["enc"].oplog


def diff_ops(scalar_ops, plan_rows, n):
    """First index where the scalar log and the device plan disagree,
    or -1. plan_rows: int32 [*, 4] (NOP rows kind<0 skipped)."""
    plan = [tuple(int(v) for v in r) for r in plan_rows[:n]
            if int(r[0]) >= 0]
    for i, (a, b) in enumerate(zip(scalar_ops, plan)):
        # BIT_LOGP normalisation: value nonzero == 1
        aa = (a[0], 1 if (a[0] == 2 and a[1]) else a[1], a[2], a[3])
        bb = (b[0], 1 if (b[0] == 2 and b[1]) else b[1], b[2], b[3])
        if aa != bb:
            return i, scalar_ops[max(0, i - 3):i + 3], plan[max(0, i - 3):i + 3]
    if len(scalar_ops) != len(plan):
        return min(len(scalar_ops), len(plan)), \
            scalar_ops[-4:], plan[-4:]
    return -1, None, None
