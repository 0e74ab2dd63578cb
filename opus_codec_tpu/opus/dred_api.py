"""User-facing DRED API: find, parse and process deep-redundancy data
from Opus packets (opus/src/opus_decoder.c:1194-1507 and the reference
wrapper src/dred.rs).

Flow: ``DredDecoder.parse(packet)`` scans the packet's padding
extensions for the DRED payload (ID 126, with the experimental
'D'+version prefix check, opus_decoder.c:1297-1359), entropy-decodes
state+latents (dnn.dred_coding), and — unless deferred — runs the
RDO-VAE decoder to recover 10 ms feature frames.  ``Dred.features``
then feeds the FARGAN vocoder (via dnn.lpcnet_plc.DeepPLC.fec_add) to
synthesise the lost audio.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np

from ..bitstream import packet as pkt
from ..dnn.dred import RDOVAEDecoder
from ..dnn.dred_coding import (DRED_EXPERIMENTAL_VERSION, DRED_EXTENSION_ID,
                               DRED_NUM_REDUNDANCY_FRAMES, DredStats,
                               dred_decode)
from ..errors import OpusError
from .extensions import extensions_parse

DRED_EXPERIMENTAL_BYTES = 2


def dred_find_payload(data: bytes) -> Tuple[Optional[bytes], int]:
    """opus_decoder.c:1297-1359: extract the DRED payload and its frame
    offset (in 2.5 ms units) from a packet's padding."""
    parsed = pkt.parse_packet(data)
    frame_size = pkt.samples_per_frame(data[0], 48000)
    try:
        exts = extensions_parse(parsed.padding)
    except OpusError:
        return None, 0
    for e in exts:
        if e.id != DRED_EXTENSION_ID:
            continue
        dred_frame_offset = e.frame * frame_size // 120
        payload = e.data
        # Experimental prefix check (opus_decoder.c:1343-1349)
        if (len(payload) > DRED_EXPERIMENTAL_BYTES
                and payload[0] == ord("D")
                and payload[1] == DRED_EXPERIMENTAL_VERSION):
            return payload[2:], dred_frame_offset
    return None, 0


@dataclass
class Dred:
    """OpusDRED (opus_private.h): parsed/processed DRED data."""
    state: np.ndarray = None
    latents: np.ndarray = None
    nb_latents: int = 0
    dred_offset: int = 0
    process_stage: int = -1
    features: Optional[np.ndarray] = None    # [4*nb_latents, 20]


class DredDecoder:
    """OpusDREDDecoder (opus_decoder.c:1194-1296): RDO-VAE decoder +
    quantisation stats loaded from a weight blob."""

    def __init__(self, model: RDOVAEDecoder,
                 stats: Optional[DredStats] = None):
        self.model = model
        self.stats = stats if stats is not None else DredStats.default(
            model.latent_dim_net, model.hidden_init.nb_inputs)

    @classmethod
    def from_blob(cls, blob: bytes,
                  stats: Optional[DredStats] = None) -> "DredDecoder":
        return cls(RDOVAEDecoder.from_blob(blob), stats)

    def parse(self, data: bytes, max_dred_samples: int,
              sampling_rate: int = 48000,
              defer_processing: bool = False) -> Tuple[Dred, int, int]:
        """opus_dred_parse (opus_decoder.c:1399-1439).

        Returns (dred, nb_samples, dred_end); nb_samples == 0 means no
        usable DRED in the packet."""
        dred = Dred()
        payload, frame_off = dred_find_payload(data)
        if payload is None:
            return dred, 0, 0
        offset = 100 * max_dred_samples // sampling_rate
        min_feature_frames = min(2 + offset, 2 * DRED_NUM_REDUNDANCY_FRAMES)
        state, latents, dred_offset = dred_decode(
            payload, self.stats, self.model.latent_dim_net,
            self.model.hidden_init.nb_inputs, min_feature_frames,
            frame_off)
        dred.state = state
        dred.latents = latents
        dred.nb_latents = len(latents)
        dred.dred_offset = dred_offset
        dred.process_stage = 1
        if not defer_processing:
            self.process(dred)
        dred_end = max(0, -dred.dred_offset * sampling_rate // 400)
        nb = max(0, dred.nb_latents * sampling_rate // 25
                 - dred.dred_offset * sampling_rate // 400)
        return dred, nb, dred_end

    def process(self, dred: Dred) -> None:
        """opus_dred_process (opus_decoder.c:1441-1458): run the RDO-VAE
        decoder to produce feature frames (idempotent)."""
        if dred.process_stage not in (1, 2):
            raise OpusError.bad_arg("DRED not parsed")
        if dred.process_stage == 2:
            return
        dred.features = self.model.decode_all(dred.state, dred.latents,
                                              dred.nb_latents)
        dred.process_stage = 2
