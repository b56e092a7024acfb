from mri_inr_tpu.configuration.config import (
    DataConfig,
    EvalConfig,
    ModelConfig,
    TrainConfig,
    TrainingConfig,
    load_test_configuration,
    load_train_configuration,
    TestConfig,
)

__all__ = [
    "DataConfig",
    "EvalConfig",
    "ModelConfig",
    "TrainConfig",
    "TrainingConfig",
    "TestConfig",
    "load_test_configuration",
    "load_train_configuration",
]
