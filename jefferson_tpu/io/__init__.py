"""jefferson_tpu.io"""
