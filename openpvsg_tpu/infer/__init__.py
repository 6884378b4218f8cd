from openpvsg_tpu.infer.segmenter import SegmenterInference, minvis_stitch
