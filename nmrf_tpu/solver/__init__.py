from .optimizer import build_optimizer, label_params, onecycle_cosine
