"""Training drivers: GSPMD pretrain / finetune / sliding-window test.

Reference: ED/main_pretrain.py, ED/main_finetune.py, ED/test_gpu.py,
ED/mmcv_custom/ (layer-decay optimizer constructors), ED/utils.py (schedules).
"""
