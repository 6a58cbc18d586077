from quest_tpu.models.llama import QuestModel, init_params
from quest_tpu.models.loader import (config_from_hf, load_hf_model,
                                     params_from_state_dict)

__all__ = ["QuestModel", "init_params", "config_from_hf", "load_hf_model",
           "params_from_state_dict"]
