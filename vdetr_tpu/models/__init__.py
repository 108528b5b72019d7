from vdetr_tpu.models.vdetr import VDETR, build_model
