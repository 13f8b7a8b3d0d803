#!/usr/bin/env python
"""ROS node: stereo_inertial (reference: Examples/ROS/ORB_SLAM3/src/ros_stereo_inertial.cc)."""
import sys
import common

if __name__ == "__main__":
    sys.exit(common.main("stereo_inertial", sys.argv[1:]))
