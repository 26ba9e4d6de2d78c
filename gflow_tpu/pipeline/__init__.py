from .trainer import GFlowTrainer
