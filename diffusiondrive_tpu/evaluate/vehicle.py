"""Ego vehicle parameters.

Replaces nuplan's `get_pacifica_parameters()` (the only vehicle the NAVSIM
stack uses). Values are the public Chrysler Pacifica spec from nuplan-devkit.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class VehicleParameters:
    width: float
    front_length: float   # [m] front axle to front bumper + axle to center... (nuplan convention)
    rear_length: float    # [m] rear axle to rear bumper
    wheel_base: float
    cog_position_from_rear_axle: float
    height: float
    vehicle_name: str = "pacifica"

    @property
    def length(self) -> float:
        return self.front_length + self.rear_length

    @property
    def half_length(self) -> float:
        return self.length / 2.0

    @property
    def half_width(self) -> float:
        return self.width / 2.0

    @property
    def rear_axle_to_center(self) -> float:
        return self.half_length - self.rear_length


def get_pacifica_parameters() -> VehicleParameters:
    return VehicleParameters(
        width=2.297,
        front_length=4.049,
        rear_length=1.127,
        wheel_base=3.089,
        cog_position_from_rear_axle=1.67,
        height=1.777,
    )
