"""Neural subsystems: weight-blob loading, NN primitives, FARGAN vocoder,
RDO-VAE (DRED) codec and the deep-PLC driver.

Mirrors the capability surface of the reference dnn/ tree
(opus/dnn/nnet.c, parse_lpcnet_weights.c, fargan.c, dred_rdovae_enc.c,
dred_rdovae_dec.c, lpcnet_plc.c).  Model weights are loaded from the
standard Opus weight-blob format, so blobs produced by the reference
tooling (dnn/torch/weight-exchange) load unchanged.
"""

from .weights import WeightArray, parse_weights, write_weights, linear_init
from .nnet import (LinearLayer, ACTIVATION_LINEAR, ACTIVATION_SIGMOID,
                   ACTIVATION_TANH, ACTIVATION_RELU, ACTIVATION_SOFTMAX,
                   ACTIVATION_SWISH, compute_generic_dense,
                   compute_generic_gru, compute_glu, compute_generic_conv1d)
from .fargan import FarganModel, FarganState
from .dred import RDOVAEEncoder, RDOVAEDecoder
from .features import LpcNetFeatures, burg_cepstral_analysis
from .pitchdnn import PitchDNN
from .lpcnet_plc import DeepPLC, PLCModel
from .osce import LaceModel, NoLaceModel, OsceEnhancer
from .osce_features import OsceFeatureState, SilkFrameInfo
from .lossgen import LossGen

__all__ = [
    "WeightArray", "parse_weights", "write_weights", "linear_init",
    "LinearLayer", "ACTIVATION_LINEAR", "ACTIVATION_SIGMOID",
    "ACTIVATION_TANH", "ACTIVATION_RELU", "ACTIVATION_SOFTMAX",
    "ACTIVATION_SWISH", "compute_generic_dense", "compute_generic_gru",
    "compute_glu", "compute_generic_conv1d",
    "FarganModel", "FarganState", "RDOVAEEncoder", "RDOVAEDecoder",
    "LpcNetFeatures", "burg_cepstral_analysis", "PitchDNN", "DeepPLC",
    "PLCModel", "LaceModel", "NoLaceModel", "OsceEnhancer",
    "OsceFeatureState", "SilkFrameInfo", "LossGen",
]
