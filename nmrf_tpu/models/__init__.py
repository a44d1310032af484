"""Model factory (reference ``nmrf/models/__init__.py`` + ``NMRF.build``)."""

from .losses import Criterion
from .nmrf import NMRF


def build_model(cfg, spatial_axis=None, msda_tap_radius=None):
    """Construct (NMRF flax module, Criterion) from a config tree.

    spatial_axis: mesh axis name to H-shard the decode region under
    shard_map (set when cfg.TPU.MESH_SPATIAL > 1; parallel/mesh.py).
    msda_tap_radius: override cfg.TPU.MSDA_TAP_RADIUS (the tap-OOB guard
    rebuilds the model with radius 0 — the exact gather path — when learned
    offsets drift outside the tap span during training)."""
    from .layers import set_gelu_approximate

    set_gelu_approximate(getattr(cfg.TPU, "GELU_APPROX", False))
    model = NMRF(
        spatial_axis=spatial_axis,
        backbone_type=cfg.BACKBONE.MODEL_TYPE,
        backbone_out_channels=cfg.BACKBONE.OUT_CHANNELS,
        backbone_drop_path=cfg.BACKBONE.DROP_PATH,
        num_proposals=cfg.DPN.NUM_PROPOSALS,
        max_disp=cfg.DPN.MAX_DISP,
        cost_group=cfg.DPN.COST_GROUP,
        context_dim=cfg.DPN.CONTEXT_DIM,
        prop_embed_dim=cfg.NMP.PROP_EMBED_DIM,
        infer_embed_dim=cfg.NMP.INFER_EMBED_DIM,
        mlp_ratio=cfg.NMP.MLP_RATIO,
        split_size=cfg.NMP.SPLIT_SIZE,
        window_size=cfg.NMP.WINDOW_SIZE,
        refine_window_size=cfg.NMP.REFINE_WINDOW_SIZE,
        prop_n_heads=cfg.NMP.PROP_N_HEADS,
        infer_n_heads=cfg.NMP.INFER_N_HEADS,
        num_prop_layers=cfg.NMP.NUM_PROP_LAYERS,
        num_infer_layers=cfg.NMP.NUM_INFER_LAYERS,
        num_refine_layers=cfg.NMP.NUM_REFINE_LAYERS,
        # honored here (the reference accepts but ignores it — defect §2.9.8)
        with_refinement=cfg.NMP.WITH_REFINEMENT,
        return_intermediate=cfg.NMP.RETURN_INTERMEDIATE,
        attn_drop=cfg.NMP.ATTN_DROP,
        proj_drop=cfg.NMP.PROJ_DROP,
        drop_path=cfg.NMP.DROP_PATH,
        dropout=cfg.NMP.DROPOUT,
        normalize_before=cfg.NMP.NORMALIZE_BEFORE,
        aux_loss=cfg.SOLVER.AUX_LOSS,
        compute_dtype=cfg.TPU.COMPUTE_DTYPE,
        use_pallas=cfg.TPU.USE_PALLAS,
        msda_tap_radius=(cfg.TPU.MSDA_TAP_RADIUS if msda_tap_radius is None
                         else msda_tap_radius),
        remat=cfg.TPU.REMAT,
    )
    criterion = Criterion(
        max_disp=cfg.SOLVER.MAX_DISP,
        loss_type=cfg.SOLVER.LOSS_TYPE,
        loss_weights=cfg.SOLVER.LOSS_WEIGHTS,
        aux_loss=cfg.SOLVER.AUX_LOSS,
        fix_proposal_weight=cfg.SOLVER.FIX_PROPOSAL_LOSS_WEIGHT,
        num_infer_layers=cfg.NMP.NUM_INFER_LAYERS,
        num_refine_layers=cfg.NMP.NUM_REFINE_LAYERS,
    )
    return model, criterion


__all__ = ["NMRF", "Criterion", "build_model"]
