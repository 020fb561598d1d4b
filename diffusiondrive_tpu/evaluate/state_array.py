"""Ego-state array helpers: 11-field dynamic state <-> footprint corners.

Parity: `pdm_planner/utils/pdm_array_representation.py` (the array-native
subset — the EgoState-object converters collapse into plain arrays here).
Works with numpy or jnp via the `xp` parameter.
"""

from __future__ import annotations

import numpy as np

from diffusiondrive_tpu.common.enums import BBCoordsIndex, StateIndex
from diffusiondrive_tpu.evaluate.vehicle import VehicleParameters, get_pacifica_parameters


def state_array_to_coords_array(states, vehicle: VehicleParameters = None, xp=np):
    """(..., 11) states -> (..., 5, 2) footprint coords (FL, RL, RR, FR, center).

    Corner order matches `BBCoordsIndex`; the center is the geometric box
    center (rear axle + rear_axle_to_center along heading).
    """
    vehicle = vehicle or get_pacifica_parameters()
    half_length, half_width, r2c = vehicle.half_length, vehicle.half_width, vehicle.rear_axle_to_center

    headings = states[..., StateIndex.HEADING]
    c, s = xp.cos(headings), xp.sin(headings)
    centers_x = states[..., StateIndex.X] + r2c * c
    centers_y = states[..., StateIndex.Y] + r2c * s

    # lateral unit vector = (cos(h + pi/2), sin(h + pi/2)) = (-s, c)
    def corner(lon, lat):
        return xp.stack(
            [centers_x + lon * c - lat * s, centers_y + lon * s + lat * c], axis=-1
        )

    fl = corner(half_length, half_width)
    rl = corner(-half_length, half_width)
    rr = corner(-half_length, -half_width)
    fr = corner(half_length, -half_width)
    center = xp.stack([centers_x, centers_y], axis=-1)
    return xp.stack([fl, rl, rr, fr, center], axis=-2)


def coords_to_exterior(coords, xp=np):
    """(..., 5, 2) coords -> closed 5-vertex polygon ring: replace the center
    slot with FRONT_LEFT so the ring closes (parity:
    `coords_array_to_polygon_array`). Vertex order FL, RL, RR, FR, FL."""
    fl = coords[..., BBCoordsIndex.FRONT_LEFT : BBCoordsIndex.FRONT_LEFT + 1, :]
    return xp.concatenate([coords[..., : BBCoordsIndex.CENTER, :], fl], axis=-2)


def box_to_corners(center_x, center_y, heading, length, width, xp=np):
    """Oriented box params -> (..., 4, 2) corners (FL, RL, RR, FR)."""
    c, s = xp.cos(heading), xp.sin(heading)
    hl, hw = length / 2.0, width / 2.0

    def corner(lon, lat):
        return xp.stack([center_x + lon * c - lat * s, center_y + lon * s + lat * c], axis=-1)

    return xp.stack(
        [corner(hl, hw), corner(-hl, hw), corner(-hl, -hw), corner(hl, -hw)], axis=-2
    )
