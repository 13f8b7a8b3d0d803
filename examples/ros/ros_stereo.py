#!/usr/bin/env python
"""ROS node: stereo (reference: Examples/ROS/ORB_SLAM3/src/ros_stereo.cc)."""
import sys
import common

if __name__ == "__main__":
    sys.exit(common.main("stereo", sys.argv[1:]))
