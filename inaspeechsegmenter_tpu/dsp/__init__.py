from .sidekit import SidekitFrontend, frame_count, CHUNK
from .mel import htk_triangular_fbank, kaldi_mel_fbank
from .patches import gather_normalized_patches, n_output_frames

__all__ = ["SidekitFrontend", "frame_count", "CHUNK", "htk_triangular_fbank",
           "kaldi_mel_fbank", "gather_normalized_patches", "n_output_frames"]
