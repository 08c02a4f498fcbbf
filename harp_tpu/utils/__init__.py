from harp_tpu.utils.io import save_result, load_result, save_checkpoint, load_checkpoint, export_obj
