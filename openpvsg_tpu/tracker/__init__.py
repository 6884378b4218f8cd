from openpvsg_tpu.tracker.kalman import KalmanFilter
from openpvsg_tpu.tracker.tracks import STrack, TrackState, IdCounter
from openpvsg_tpu.tracker.tubes import QueryFeatTube, SimpleTube
from openpvsg_tpu.tracker.tracker import MaskAssociationTracker
from openpvsg_tpu.tracker import matching
