#!/usr/bin/env python
"""ROS node: rgbd (reference: Examples/ROS/ORB_SLAM3/src/ros_rgbd.cc)."""
import sys
import common

if __name__ == "__main__":
    sys.exit(common.main("rgbd", sys.argv[1:]))
