from openpvsg_tpu.models.relation.heads import (
    ObjectEncoder, PairProposalNetwork, VanillaModel, HandcraftedFilter,
    Learnable1DConv, TemporalTransformer, RelationModel, build_relation_model)
from openpvsg_tpu.models.relation import losses, utils
