from .playout import AudioPlayout, BlockStats, have_output_device
