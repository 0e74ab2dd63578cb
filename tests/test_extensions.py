"""Packet-extension tests: byte-exact against the libopus oracle
(tools/oracle/ext_check.c drives opus_packet_extensions_generate/parse;
its output is pinned in ext_check.txt)."""
import os

import pytest

from opus_codec_tpu.errors import OpusError
from opus_codec_tpu.opus.extensions import (ExtensionData, extensions_count,
                                            extensions_generate,
                                            extensions_parse)

ORACLE_TXT = os.path.join(os.path.dirname(__file__), "..", "tools",
                          "oracle", "ext_check.txt")

DRED = b"DRED-PAYLOAD-0123456789" + b"\x00" * 277

SCENARIOS = [
    ([ExtensionData(2, 0, b"a"), ExtensionData(32, 10, b"DRED"),
      ExtensionData(33, 1, b"NOT DRED"), ExtensionData(3, 4, b"")],
     32, True),
    ([ExtensionData(126, 0, DRED[:260])], 262, False),
    ([ExtensionData(127, 0, DRED[:255]), ExtensionData(5, 0, b"x")],
     300, True),
    ([ExtensionData(40, 2, DRED[:10]), ExtensionData(41, 2, DRED[:3]),
      ExtensionData(7, 0, b"")], 40, True),
]


def _oracle_blocks():
    with open(ORACLE_TXT) as f:
        lines = [l.strip() for l in f if l.strip()]
    blocks = []
    cur = None
    for l in lines:
        if l.startswith("GEN "):
            cur = {"gen": l.split()[2] if len(l.split()) > 2 else "",
                   "len": int(l.split()[1]), "parse": []}
            blocks.append(cur)
        elif l.startswith("COUNT "):
            cur["count"] = int(l.split()[1])
        elif l.startswith("PARSE "):
            p = l.split()
            cur["parse"].append((int(p[1]), int(p[2]),
                                 p[3] if len(p) > 3 else ""))
    return blocks


@pytest.mark.skipif(not os.path.exists(ORACLE_TXT),
                    reason="oracle output missing")
def test_generate_matches_oracle():
    blocks = _oracle_blocks()
    assert len(blocks) == len(SCENARIOS)
    for (exts, size, pad), blk in zip(SCENARIOS, blocks):
        data = extensions_generate(exts, size, pad=pad)
        assert len(data) == blk["len"]
        assert data.hex() == blk["gen"]
        assert extensions_count(data) == blk["count"]
        parsed = extensions_parse(data)
        got = [(e.id, e.frame, e.data.hex()) for e in parsed]
        assert got == blk["parse"]


def test_roundtrip_all_id_kinds():
    exts = [ExtensionData(2, 0, b""), ExtensionData(31, 0, b"\x7f"),
            ExtensionData(100, 3, bytes(range(100))),
            ExtensionData(127, 47, b"tail")]
    data = extensions_generate(exts, 200, pad=True)
    assert len(data) == 200
    back = extensions_parse(data)
    assert [(e.id, e.frame, e.data) for e in back] == \
        [(e.id, e.frame, e.data) for e in exts]


def test_bad_args():
    with pytest.raises(OpusError):
        extensions_generate([ExtensionData(1, 0, b"")], 10)   # id < 2
    with pytest.raises(OpusError):
        extensions_generate([ExtensionData(128, 0, b"")], 10)
    with pytest.raises(OpusError):
        extensions_generate([ExtensionData(2, 48, b"")], 10)  # frame >= 48
    with pytest.raises(OpusError):
        extensions_generate([ExtensionData(2, 0, b"ab")], 10)  # short > 1
    with pytest.raises(OpusError):   # doesn't fit
        extensions_generate([ExtensionData(100, 0, bytes(50))], 10)


def test_parse_malformed():
    # long extension with length chain pointing past the end
    with pytest.raises(OpusError):
        extensions_parse(bytes([(100 << 1) | 1, 200, 0]))
    # frame separator overflow
    with pytest.raises(OpusError):
        extensions_parse(bytes([0x03, 60, (2 << 1)]))
    # truncated length chain
    with pytest.raises(OpusError):
        extensions_parse(bytes([(100 << 1) | 1]))


def test_padding_only():
    assert extensions_parse(b"\x01" * 10) == []
    assert extensions_count(b"\x01\x01\x00garbage-is-skipped") == 0
