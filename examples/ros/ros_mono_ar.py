#!/usr/bin/env python
"""ROS node: mono_ar (reference: Examples/ROS/ORB_SLAM3/src/ros_mono_ar.cc)."""
import sys
import common

if __name__ == "__main__":
    sys.exit(common.main("mono_ar", sys.argv[1:]))
