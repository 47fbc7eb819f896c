"""jefferson_tpu.reverb"""
