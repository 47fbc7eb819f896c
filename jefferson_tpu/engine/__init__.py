"""jefferson_tpu.engine"""
