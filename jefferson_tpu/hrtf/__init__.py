"""jefferson_tpu.hrtf"""
