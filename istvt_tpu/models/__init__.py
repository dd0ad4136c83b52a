from istvt_tpu.models.registry import model_selection, available_models
