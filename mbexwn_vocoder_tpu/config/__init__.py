from .config_utils import (
    read_config,
    dump_config,
    modify_config,
    get_list_parameter,
    get_model_config,
    check_config_dict,
    check_preprocess_config,
    check_training_config,
    check_spect_loss_config,
    check_checkpoint_config,
    check_wavenet_config,
)
