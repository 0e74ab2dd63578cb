"""Protocol constants (src/constants.rs, opus_encoder.c:1090, packet.rs:169)."""

MAX_FRAME_SAMPLES_48KHZ = 5760  # 120 ms at 48 kHz
MAX_PACKET_BYTES = 1276         # recommended max packet size
MAX_FRAME_BYTES = 1275          # max bytes for a single frame
MAX_FRAMES_PER_PACKET = 48


def max_frame_samples_for(sample_rate: int) -> int:
    """Linear scaling of the 120 ms cap (constants.rs:8-19)."""
    return MAX_FRAME_SAMPLES_48KHZ * sample_rate // 48000
