from vdetr_tpu.eval.ap_calculator import APCalculator, get_ap_config_dict, parse_predictions
from vdetr_tpu.eval.eval_det import eval_det, eval_det_multiprocessing, voc_ap
