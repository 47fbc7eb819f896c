"""jefferson_tpu.trajectory"""
