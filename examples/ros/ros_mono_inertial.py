#!/usr/bin/env python
"""ROS node: mono_inertial (reference: Examples/ROS/ORB_SLAM3/src/ros_mono_inertial.cc)."""
import sys
import common

if __name__ == "__main__":
    sys.exit(common.main("mono_inertial", sys.argv[1:]))
