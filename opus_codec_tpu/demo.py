"""Encode/decode file harness — the framework's own ``opus_demo``.

Behavioural parity: /root/reference/opus/src/opus_demo.c (usage :116-144,
bitstream framing :150-161, encode/decode loop :700-1100).  Same flag
surface and the same interchange bitstream format: per packet a 4-byte
big-endian payload length, a 4-byte big-endian encoder final_range, then
the payload; length 0 marks a lost packet (decoder runs PLC).

CLI:
  python -m opus_codec_tpu.demo [-e] <application> <rate> <ch> <bps> \
      [options] input.sw output.bit
  python -m opus_codec_tpu.demo -d <rate> <ch> [options] input.bit out.sw
"""

from __future__ import annotations

import struct
import sys

import numpy as np

from .api import Decoder, Encoder
from .types import Application, Bandwidth, Bitrate

_APPS = {"voip": Application.VOIP, "audio": Application.AUDIO,
         "restricted-lowdelay": Application.RESTRICTED_LOW_DELAY}
_BWS = {"NB": Bandwidth.NARROWBAND, "MB": Bandwidth.MEDIUMBAND,
        "WB": Bandwidth.WIDEBAND, "SWB": Bandwidth.SUPERWIDEBAND,
        "FB": Bandwidth.FULLBAND}
_FRAMESIZES = {"2.5": 2.5, "5": 5, "10": 10, "20": 20, "40": 40,
               "60": 60, "80": 80, "100": 100, "120": 120}


def _usage():
    print(__doc__, file=sys.stderr)
    return 1


def run_encode(rate, channels, bitrate, app, opts, fin, fout) -> dict:
    enc = Encoder(rate, channels, app)
    enc.set_bitrate(Bitrate(bitrate) if bitrate > 0 else Bitrate.AUTO)
    enc.set_vbr(not opts["cbr"])
    enc.set_vbr_constraint(opts["cvbr"])
    enc.set_complexity(opts["complexity"])
    enc.set_inband_fec(opts["inbandfec"])
    enc.set_dtx(opts["dtx"])
    enc.set_packet_loss_perc(opts["loss"])
    if opts["bandwidth"] is not None:
        enc.set_bandwidth(opts["bandwidth"])
    if opts["forcemono"]:
        enc.set_force_channels(1)
    if opts["dred"]:
        enc.set_dred_duration(opts["dred"])
    frame_samples = int(rate * opts["framesize"] / 1000)
    pcm = np.fromfile(fin, np.dtype("<i2"))
    n_frames = len(pcm) // (frame_samples * channels)
    tot_bytes = 0
    tot_samples = 0
    with open(fout, "wb") as f:
        for i in range(n_frames):
            seg = pcm[i * frame_samples * channels:
                      (i + 1) * frame_samples * channels]
            data = enc.encode(seg.astype(np.int16),
                              max_bytes=opts["max_payload"])
            f.write(struct.pack(">II", len(data), enc.final_range))
            f.write(data)
            tot_bytes += len(data)
            tot_samples += frame_samples
    dur = tot_samples / rate if tot_samples else 1.0
    return {"frames": n_frames, "bytes": tot_bytes,
            "bitrate_kbps": tot_bytes * 8 / dur / 1000.0}


def run_decode(rate, channels, opts, fin, fout) -> dict:
    dec = Decoder(rate, channels)
    rng_mismatch = 0
    lost = 0
    frames = 0
    data = open(fin, "rb").read()
    pos = 0
    rng_loss = np.random.default_rng(42)
    prev_samples = rate // 50
    with open(fout, "wb") as f:
        while pos + 8 <= len(data):
            length, enc_rng = struct.unpack(">II", data[pos:pos + 8])
            pos += 8
            payload = data[pos:pos + length]
            pos += length
            drop = length == 0 or (
                opts["loss"] and rng_loss.random() * 100 < opts["loss"])
            if drop:
                out = dec.decode(b"", prev_samples)
                lost += 1
            else:
                from .bitstream.packet import packet_nb_samples
                prev_samples = packet_nb_samples(payload, rate)
                out = dec.decode(payload, prev_samples)
                if enc_rng != 0 and dec.get_final_range() != enc_rng:
                    rng_mismatch += 1
            f.write(np.asarray(out, np.int16).tobytes())
            frames += 1
    return {"frames": frames, "lost": lost,
            "range_mismatches": rng_mismatch}


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        return _usage()
    decode_only = argv[0] == "-d"
    if argv[0] in ("-e", "-d"):
        argv.pop(0)
    try:
        if decode_only:
            rate, channels = int(argv[0]), int(argv[1])
            rest = argv[2:]
            app = None
            bitrate = 0
        else:
            app = _APPS[argv[0]]
            rate, channels, bitrate = (int(argv[1]), int(argv[2]),
                                       int(argv[3]))
            rest = argv[4:]
    except (IndexError, KeyError, ValueError):
        return _usage()

    opts = {"cbr": False, "cvbr": False, "bandwidth": None,
            "framesize": 20.0, "max_payload": 1024, "complexity": 10,
            "inbandfec": False, "forcemono": False, "dtx": False,
            "loss": 0, "dred": 0}
    i = 0
    while i < len(rest) - 2:
        a = rest[i]
        if a == "-cbr":
            opts["cbr"] = True
        elif a == "-cvbr":
            opts["cvbr"] = True
        elif a == "-delayed-decision":
            pass                    # analysis lookahead: accepted, no-op
        elif a == "-bandwidth":
            i += 1
            opts["bandwidth"] = _BWS[rest[i]]
        elif a == "-framesize":
            i += 1
            opts["framesize"] = _FRAMESIZES[rest[i]]
        elif a == "-max_payload":
            i += 1
            opts["max_payload"] = int(rest[i])
        elif a == "-complexity":
            i += 1
            opts["complexity"] = int(rest[i])
        elif a == "-dec_complexity":
            i += 1
        elif a == "-inbandfec":
            opts["inbandfec"] = True
        elif a == "-forcemono":
            opts["forcemono"] = True
        elif a == "-dtx":
            opts["dtx"] = True
        elif a == "-loss":
            i += 1
            opts["loss"] = int(rest[i])
        elif a == "-dred":
            i += 1
            opts["dred"] = int(rest[i])
        else:
            print(f"unknown option {a}", file=sys.stderr)
            return _usage()
        i += 1
    if len(rest) - i != 2:
        return _usage()
    fin, fout = rest[i], rest[i + 1]

    if decode_only:
        stats = run_decode(rate, channels, opts, fin, fout)
        print(f"decoded {stats['frames']} packets "
              f"({stats['lost']} lost)", file=sys.stderr)
        if stats["range_mismatches"]:
            print(f"Error: {stats['range_mismatches']} range coder "
                  "state mismatches", file=sys.stderr)
            return 1
    else:
        stats = run_encode(rate, channels, bitrate, app, opts, fin, fout)
        print(f"encoded {stats['frames']} frames, average bitrate "
              f"{stats['bitrate_kbps']:.3f} kb/s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
