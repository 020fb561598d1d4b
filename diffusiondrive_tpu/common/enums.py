"""Index layouts for packed state arrays.

Parity: `navsim/common/enums.py` (StateSE2Index, BoundingBoxIndex, LidarIndex)
and `navsim/planning/simulation/planner/pdm_planner/utils/pdm_enums.py`
(StateIndex & friends). Implemented as plain int class attributes so they can
be used inside jitted code (static Python ints, no IntEnum overhead).
"""

from __future__ import annotations


class StateSE2Index:
    """Layout of an SE(2) pose array: (x, y, heading)."""

    X = 0
    Y = 1
    HEADING = 2

    POINT = slice(0, 2)
    STATE_SE2 = slice(0, 3)

    @classmethod
    def size(cls) -> int:
        return 3


class BoundingBoxIndex:
    """Layout of a 3D bounding box array in logs: (x, y, z, l, w, h, heading)."""

    X = 0
    Y = 1
    Z = 2
    LENGTH = 3
    WIDTH = 4
    HEIGHT = 5
    HEADING = 6

    POINT2D = slice(0, 2)
    POSITION = slice(0, 3)
    DIMENSION = slice(3, 6)

    @classmethod
    def size(cls) -> int:
        return 7


class BoundingBox2DIndex:
    """Layout of the 2D (BEV) agent box predicted by the detection head.

    Parity: `navsim/agents/diffusiondrive/transfuser_features.py` (BoundingBox2DIndex).
    """

    X = 0
    Y = 1
    HEADING = 2
    LENGTH = 3
    WIDTH = 4

    POINT = slice(0, 2)
    STATE_SE2 = slice(0, 3)

    @classmethod
    def size(cls) -> int:
        return 5


class LidarIndex:
    """Layout of a packed lidar point-cloud array (6, num_points)."""

    X = 0
    Y = 1
    Z = 2
    INTENSITY = 3
    RING = 4
    ID = 5

    POINT2D = slice(0, 2)
    POSITION = slice(0, 3)

    @classmethod
    def size(cls) -> int:
        return 6


class StateIndex:
    """Layout of the 11-field dynamic ego state array used by the PDM engine.

    Parity: `pdm_planner/utils/pdm_enums.py:StateIndex`.
    """

    X = 0
    Y = 1
    HEADING = 2
    VELOCITY_X = 3
    VELOCITY_Y = 4
    ACCELERATION_X = 5
    ACCELERATION_Y = 6
    STEERING_ANGLE = 7
    STEERING_RATE = 8
    ANGULAR_VELOCITY = 9
    ANGULAR_ACCELERATION = 10

    POINT = slice(0, 2)
    STATE_SE2 = slice(0, 3)
    VELOCITY_2D = slice(3, 5)
    ACCELERATION_2D = slice(5, 7)

    @classmethod
    def size(cls) -> int:
        return 11


class SE2Index:
    """Alias triple used for (x, y, heading) dynamic quantities."""

    X = 0
    Y = 1
    HEADING = 2

    @classmethod
    def size(cls) -> int:
        return 3


class PointIndex:
    """Layout of a 2D point."""

    X = 0
    Y = 1

    @classmethod
    def size(cls) -> int:
        return 2


class EgoAreaIndex:
    """Ego-area classification channels used by the PDM scorer.

    Parity: `pdm_planner/utils/pdm_enums.py:EgoAreaIndex`.
    """

    MULTIPLE_LANES = 0
    NON_DRIVABLE_AREA = 1
    ONCOMING_TRAFFIC = 2

    @classmethod
    def size(cls) -> int:
        return 3


class MultiMetricIndex:
    """Multiplicative sub-metrics of the PDM score.

    Parity: `pdm_planner/utils/pdm_enums.py:MultiMetricIndex` —
    driving-direction is NOT multiplicative; it lives in
    `WeightedMetricIndex` (with default weight 0).
    """

    NO_COLLISION = 0
    DRIVABLE_AREA = 1

    @classmethod
    def size(cls) -> int:
        return 2


class WeightedMetricIndex:
    """Weighted-average sub-metrics of the PDM score.

    Parity: `pdm_planner/utils/pdm_enums.py:WeightedMetricIndex`.
    The scorer builds its weight vector from this order
    (`evaluate/scorer.py:score_proposals`), so layout and aggregation
    cannot drift apart.
    """

    PROGRESS = 0
    TTC = 1
    COMFORTABLE = 2
    DRIVING_DIRECTION = 3

    @classmethod
    def size(cls) -> int:
        return 4


class LeadingAgentIndex:
    """Layout of leading-agent arrays in IDM proposal generation."""

    PROGRESS = 0
    VELOCITY = 1
    LENGTH_REAR = 2

    @classmethod
    def size(cls) -> int:
        return 3


class BBCoordsIndex:
    """Corner layout of an oriented-box coordinate array (5 points: 4 corners + center)."""

    FRONT_LEFT = 0
    REAR_LEFT = 1
    REAR_RIGHT = 2
    FRONT_RIGHT = 3
    CENTER = 4

    @classmethod
    def size(cls) -> int:
        return 5
