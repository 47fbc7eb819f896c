"""jefferson_tpu.cli"""
