"""jefferson_tpu.bench"""
